"""Every queries() entry vs its oracle_sql() via local DuckDB.

This is the same check the driver runs at sf0.01 (we default to
sf0.001 for the fast inner loop; set SPARK_GRAFT_TEST_SF_DIR to
rerun at other scale factors).
"""

from __future__ import annotations

import pytest

from lance_duckdb_spark.registry import ORACLE_REGISTRY, QUERY_REGISTRY

from .oracle import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE_REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERY_REGISTRY[name](spark, sf_dir)
    compare(df, con, ORACLE_REGISTRY[name], name)


def test_no_rows_only_queries_remain():
    # r5: every registered query has a hash oracle; if this set ever
    # grows again, add a rows-only runner back alongside the
    # documentation in test_registry.py
    assert set(QUERY_REGISTRY) == set(ORACLE_REGISTRY)
