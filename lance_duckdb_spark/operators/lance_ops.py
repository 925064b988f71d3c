"""Lance-connector parity queries (SURVEY.md §2.A1-A6) exposed via
the driver contract: write real test tables into a Lance dataset,
read them back through ``spark.read.format("lance")``, and run
analytics over the result. The DuckDB oracle computes the same
answers from the original parquet — so a hash match proves the
connector's write→commit→scan path is lossless.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.datasource import register
from ..tables import load
from .common import dsum, money

_WORKDIR = "/tmp/lance_duckdb_spark"


def _fresh_root(sf_dir: str, name: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join(_WORKDIR, tag, f"{name}.lance")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.dirname(root), exist_ok=True)
    return root


def lance_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A3/A5: write customer through the lance writer, scan it
    back, join against orders, aggregate. Equals the same query on
    the original parquet iff the roundtrip is lossless."""
    register(spark)
    root = _fresh_root(sf_dir, "roundtrip")
    load(spark, sf_dir, "customer").write.format("lance").mode("overwrite").save(root)
    cust = spark.read.format("lance").load(root)
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice"), "revenue"),
            F.countDistinct("c_custkey").alias("n_cust"),
        )
        .orderBy("c_mktsegment")
    )


LANCE_ROUNDTRIP_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(DISTINCT c_custkey) AS n_cust
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def lance_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6: overwrite creates v1, append creates v2; version=1 must
    see only the first write, the latest read sees both."""
    register(spark)
    root = _fresh_root(sf_dir, "timetravel")
    orders = load(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    orders.where(F.col("o_orderdate") < cut).write.format("lance").mode(
        "overwrite"
    ).save(root)
    orders.where(F.col("o_orderdate") >= cut).write.format("lance").mode(
        "append"
    ).save(root)

    v1 = spark.read.format("lance").option("version", 1).load(root)
    latest = spark.read.format("lance").load(root)
    a = v1.agg(
        F.count(F.lit(1)).alias("v1_orders"),
        dsum(money("o_totalprice"), "v1_revenue"),
    )
    b = latest.agg(
        F.count(F.lit(1)).alias("latest_orders"),
        dsum(money("o_totalprice"), "latest_revenue"),
    )
    return a.crossJoin(b)


LANCE_TIME_TRAVEL_SQL = """
SELECT
  (SELECT COUNT(*) FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01') AS v1_orders,
  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
     FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01') AS v1_revenue,
  (SELECT COUNT(*) FROM orders) AS latest_orders,
  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
     FROM orders) AS latest_revenue
"""


def lance_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: scan with a pushable predicate + narrowed schema; the
    filter is consumed inside the fragment reader (pyarrow row-group
    skipping), not by a Spark Filter node (asserted in
    tests/test_lance_source.py)."""
    register(spark)
    root = _fresh_root(sf_dir, "pushdown")
    load(spark, sf_dir, "lineitem").write.format("lance").mode("overwrite").save(root)
    li = spark.read.format("lance").load(root)
    return (
        li.where((F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(money("l_quantity"), "sum_qty"),
        )
        .orderBy("l_returnflag")
    )


LANCE_PUSHDOWN_SQL = """
SELECT l_returnflag, COUNT(*) AS n_items,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_quantity >= 10 AND l_quantity <= 20
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def lance_dataset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 introspection as a checked query: write part with a fixed
    fragment layout, read the dataset metadata back (version,
    fragment count, per-manifest row total, field count) — equal to
    ground truth iff open/manifest/schema introspection is correct
    (reference: lance_open_dataset + lance_get_schema +
    lance_schema_num_fields, rust/lib.rs:26-144)."""
    from ..sources import lance_format as lf

    register(spark)
    root = _fresh_root(sf_dir, "stats")
    load(spark, sf_dir, "part").repartition(4).write.format("lance").mode(
        "overwrite"
    ).save(root)
    manifest = lf.read_manifest(root)
    import json as _json

    n_fields = len(_json.loads(manifest.schema_json)["fields"])
    row = [
        (
            manifest.version,
            len(manifest.fragments),
            sum(f.num_rows for f in manifest.fragments),
            n_fields,
        )
    ]
    return spark.createDataFrame(
        row, schema="version int, n_fragments int, total_rows long, n_fields int"
    )


LANCE_DATASET_STATS_SQL = """
SELECT CAST(1 AS INTEGER) AS version,
       CAST(4 AS INTEGER) AS n_fragments,
       (SELECT COUNT(*) FROM part) AS total_rows,
       CAST(6 AS INTEGER) AS n_fields
"""


QUERIES = {
    "lance_roundtrip": lance_roundtrip,
    "lance_time_travel": lance_time_travel,
    "lance_pushdown_scan": lance_pushdown_scan,
    "lance_dataset_stats": lance_dataset_stats,
}

ORACLE = {
    "lance_roundtrip": LANCE_ROUNDTRIP_SQL,
    "lance_time_travel": LANCE_TIME_TRAVEL_SQL,
    "lance_pushdown_scan": LANCE_PUSHDOWN_SQL,
    "lance_dataset_stats": LANCE_DATASET_STATS_SQL,
}
