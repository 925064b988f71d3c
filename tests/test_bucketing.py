"""Bucketed co-located join: no Exchange below the SortMergeJoin,
results identical to the plain join."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.operators import bucketing as B
from lance_duckdb_spark.operators.common import dsum2, revenue_dec
from lance_duckdb_spark.tables import load


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return B.write_bucketed_tables(spark, sf_dir)


def test_join_plan_is_exchange_free_below_smj(spark, tables):
    li_t, o_t = tables
    df = B.colocated_join(spark, li_t, o_t)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the ONLY exchanges sit above the join (final agg + sort); the
    # join inputs come straight from the bucketed file scans
    join_subtree = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_subtree
    assert len(re.findall(r"\bExchange\b", plan)) == 2
    assert "Bucketed: true" in plan


def test_bucketed_join_equals_plain_join(spark, sf_dir, tables):
    li_t, o_t = tables
    got = B.colocated_join(spark, li_t, o_t).collect()
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    expect = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum2(revenue_dec(), "revenue"),
        )
        .orderBy("o_orderpriority")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in expect]
