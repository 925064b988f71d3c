"""Bucketed co-located fact⋈fact join — the shuffle-elimination
layout evidence for 100 TB.

A lineitem⋈orders join on orderkey normally shuffles BOTH fact
tables on the key — at 100 TB that shuffle is the job. Writing both
tables bucketed on the join key (same bucket count) lets Spark's
bucketed scan report the hash distribution the join needs, so the
SortMergeJoin runs with ZERO exchanges on either input: each task
joins bucket i of lineitem against bucket i of orders where it sits.
tests/test_bucketing.py asserts the plan has no Exchange below the
join (the only shuffle left is the final small aggregate).

This is the write-once/join-many layout decision a warehouse makes
for its hottest join key; the one-time bucketed write costs exactly
the shuffle it then saves on every subsequent join.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .common import SQL_REV, dsum2, revenue_dec

N_BUCKETS = 8


def _safe_tag(sf_dir: str) -> str:
    return re.sub(r"[^0-9A-Za-z_]", "_", os.path.basename(sf_dir.rstrip("/")))


def write_bucketed_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """(Re)write lineitem and orders bucketed on the join key into
    session catalog tables; returns the table names."""
    tag = _safe_tag(sf_dir)
    li_t, o_t = f"li_bucketed_{tag}", f"o_bucketed_{tag}"
    base = os.path.join("/tmp/lance_duckdb_spark", tag, "bucketed")
    for name in (li_t, o_t):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(base, ignore_errors=True)
    (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(base, li_t))
        .mode("overwrite")
        .saveAsTable(li_t)
    )
    (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(base, o_t))
        .mode("overwrite")
        .saveAsTable(o_t)
    )
    return li_t, o_t


def colocated_join(spark: SparkSession, li_t: str, o_t: str) -> DataFrame:
    li = spark.table(li_t)
    orders = spark.table(o_t)
    # merge hint: at test SF the orders side fits the broadcast
    # threshold and Spark would elide the join shuffle that way; the
    # layout this operator demonstrates is for BOTH sides too big to
    # broadcast (the 100 TB case), which is sort-merge — forced here
    # so the exchange-free bucketed SMJ is what actually runs
    return (
        li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum2(revenue_dec(), "revenue"),
        )
        .orderBy("o_orderpriority")
    )


def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: bucketed write + exchange-free join; hash-exact
    against the plain-join oracle (layout must never change
    answers)."""
    li_t, o_t = write_bucketed_tables(spark, sf_dir)
    return colocated_join(spark, li_t, o_t)


BUCKETED_JOIN_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_items,
  CAST(ROUND(SUM({SQL_REV}), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES = {
    "bucketed_colocated_join": bucketed_colocated_join,
}

ORACLE = {
    "bucketed_colocated_join": BUCKETED_JOIN_SQL,
}
