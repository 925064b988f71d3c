"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (tpch_q1) at sf0.001;
``queries`` / ``oracle_sql`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle. Query implementations live in
``lance_duckdb_spark/operators/`` — this module only aggregates
their registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file from any cwd — make the package
# resolvable relative to this file
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from lance_duckdb_spark.registry import ORACLE_REGISTRY, QUERY_REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERY_REGISTRY["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERY_REGISTRY)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_REGISTRY)
