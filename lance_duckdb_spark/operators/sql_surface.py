"""Additional DuckDB-SQL-surface parity queries (SURVEY.md §2.B,
extended): JSON extraction, set operations, string functions,
calendar truncation, CASE bucketing, and the textual SQL API
(``spark.sql`` over registered views) — the remaining surface a
lance-duckdb user exercises day-to-day beyond joins/aggs/windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load, register_views
from .common import dsum, money


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props is a JSON string column; extract $.k JVM-side."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer key sets."""
    orders = load(spark, sf_dir, "orders")
    y2000 = (
        orders.where(F.year("o_orderdate") == 2000).select("o_custkey").distinct()
    )
    y2001 = (
        orders.where(F.year("o_orderdate") == 2001).select("o_custkey").distinct()
    )
    return (
        y2000.union(y2001)
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_union"))
        .crossJoin(
            F.broadcast(
                y2000.intersect(y2001).agg(F.count(F.lit(1)).alias("n_intersect"))
            )
        )
        .crossJoin(
            F.broadcast(
                y2000.exceptAll(y2000.intersect(y2001)).agg(
                    F.count(F.lit(1)).alias("n_except")
                )
            )
        )
    )


SET_OPS_SQL = """
WITH y2000 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 2000),
     y2001 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 2001)
SELECT
  (SELECT COUNT(*) FROM (SELECT * FROM y2000 UNION SELECT * FROM y2001)) AS n_union,
  (SELECT COUNT(*) FROM (SELECT * FROM y2000 INTERSECT SELECT * FROM y2001)) AS n_intersect,
  (SELECT COUNT(*) FROM (SELECT * FROM y2000 EXCEPT SELECT * FROM y2001)) AS n_except
"""


def sql_api_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's textual SQL surface: registered views +
    spark.sql — same query text shape as the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
          SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_finished,
          SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_open,
          SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS n_pending,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


SQL_API_SQL = """
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (
        part.select(
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_type", 1, 3).alias("type3"),
            F.length("p_name").alias("name_len"),
            F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        )
        .groupBy("brand_u", "type3")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("name_len").cast("long").alias("total_name_len"),
            F.countDistinct("brand_type").alias("n_brand_type"),
            F.min("name_novowels").alias("first_novowels"),
        )
        .orderBy("brand_u", "type3")
    )


STRING_FUNCS_SQL = """
SELECT upper(p_brand) AS brand_u, substr(p_type, 1, 3) AS type3,
  COUNT(*) AS n,
  CAST(SUM(length(p_name)) AS BIGINT) AS total_name_len,
  COUNT(DISTINCT p_brand || '-' || p_type) AS n_brand_type,
  MIN(regexp_replace(p_name, '[aeiou]', '', 'g')) AS first_novowels
FROM part
GROUP BY 1, 2
ORDER BY brand_u, type3
"""


def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(
            dsum(money("o_totalprice"), "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("month")
    )


MONTHLY_REVENUE_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders
GROUP BY 1
ORDER BY month
"""


def case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice"), "revenue"),
        )
        .orderBy("bucket")
    )


CASE_BUCKETS_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            WHEN o_totalprice < 300000 THEN 'large'
            ELSE 'jumbo' END AS bucket,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY 1
ORDER BY bucket
"""


QUERIES = {
    "events_json_extract": events_json_extract,
    "set_ops": set_ops,
    "sql_api_priority_matrix": sql_api_priority_matrix,
    "string_funcs": string_funcs,
    "monthly_revenue": monthly_revenue,
    "case_buckets": case_buckets,
}

ORACLE = {
    "events_json_extract": EVENTS_JSON_SQL,
    "set_ops": SET_OPS_SQL,
    "sql_api_priority_matrix": SQL_API_SQL,
    "string_funcs": STRING_FUNCS_SQL,
    "monthly_revenue": MONTHLY_REVENUE_SQL,
    "case_buckets": CASE_BUCKETS_SQL,
}
