"""SQL-surface parity, round 2 (SURVEY §2.B extended): CUBE
aggregation, RANGE window frames, correlated scalar subqueries,
EXISTS/NOT EXISTS rewrites, and per-group exact quantile arrays —
completing the analytic-SQL shapes a DuckDB user reaches for that
round 1 did not yet driver-check.

All declarative DataFrame/SQL API, all Catalyst-optimized (the
correlated subquery decorrelates into a broadcast-able aggregate
join; EXISTS becomes a semi-join), all hash-exact vs DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .common import dsum, money


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all 4 grouping-set
    combinations in one pass (partial aggregation expands the sets
    map-side, one shuffle)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice"), "revenue"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_REVENUE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def window_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN frame: for each day, revenue summed over the
    trailing 7-DAY range (value-based frame, not row-based — days
    with gaps weight correctly). Daily pre-aggregation keeps the
    window input small; the frame is integer day arithmetic so both
    engines agree exactly."""
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            ).alias("day_idx"),
            money("o_totalprice").alias("p"),
        )
        .groupBy("day_idx")
        .agg(F.sum("p").alias("rev"))
    )
    w = (
        Window.orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
    )
    return (
        daily.select(
            "day_idx",
            F.col("rev").cast("double").alias("day_revenue"),
            F.sum("rev").over(w).cast("double").alias("trailing_7d"),
        )
        .orderBy("day_idx")
    )


WINDOW_RANGE_SQL = """
WITH daily AS (
  SELECT datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS day_idx,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT day_idx,
  CAST(rev AS DOUBLE) AS day_revenue,
  CAST(SUM(rev) OVER (ORDER BY day_idx
       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS trailing_7d
FROM daily ORDER BY day_idx
"""


def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose account balance exceeds their nation's
    average — the classic correlated scalar subquery. Expressed via
    spark.sql so Catalyst's decorrelation (rewrite to aggregate +
    join) is what executes; the per-nation average join side is tiny
    and broadcasts."""
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        "sql2_customer"
    )
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS n_above,
               MIN(c_custkey) AS first_cust
        FROM sql2_customer c
        WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
          FROM sql2_customer i WHERE i.c_nationkey = c.c_nationkey
        )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )


CORRELATED_SUBQUERY_SQL = """
SELECT c_nationkey, COUNT(*) AS n_above, MIN(c_custkey) AS first_cust
FROM customer c
WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
  FROM customer i WHERE i.c_nationkey = c.c_nationkey
)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS with a correlated predicate: suppliers in
    nations that have (and have not) any URGENT order from a local
    customer. Catalyst plans both as semi/anti joins."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("sql2_supplier")
    load(spark, sf_dir, "customer").createOrReplaceTempView("sql2_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("sql2_orders")
    return spark.sql(
        """
        SELECT s_nationkey,
               COUNT(*) AS n_suppliers,
               SUM(CASE WHEN EXISTS (
                     SELECT 1 FROM sql2_customer c
                     JOIN sql2_orders o ON o.o_custkey = c.c_custkey
                     WHERE c.c_nationkey = s.s_nationkey
                       AND o.o_orderpriority = '1-URGENT'
                   ) THEN 1 ELSE 0 END) AS in_urgent_nation
        FROM sql2_supplier s
        GROUP BY s_nationkey
        ORDER BY s_nationkey
        """
    )


EXISTS_CORRELATED_SQL = """
SELECT s_nationkey,
       COUNT(*) AS n_suppliers,
       CAST(SUM(CASE WHEN EXISTS (
             SELECT 1 FROM customer c
             JOIN orders o ON o.o_custkey = c.c_custkey
             WHERE c.c_nationkey = s.s_nationkey
               AND o.o_orderpriority = '1-URGENT'
           ) THEN 1 ELSE 0 END) AS BIGINT) AS in_urgent_nation
FROM supplier s
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


def group_quantile_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-quantile per group as an ARRAY result (DuckDB's
    quantile_cont(x, [..]) shape) — exercises array-typed aggregate
    output through the driver's hash compare."""
    li = load(spark, sf_dir, "lineitem")
    qs = [0.1, 0.5, 0.9]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                money("l_quantity").cast("double"), qs, 2147483647
            ).alias("q_quantity"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("q_quantity", 1), 6).alias("q10"),
            F.round(F.element_at("q_quantity", 2), 6).alias("q50"),
            F.round(F.element_at("q_quantity", 3), 6).alias("q90"),
            "n",
        )
        .orderBy("l_returnflag")
    )


GROUP_QUANTILE_SQL = """
SELECT l_returnflag,
  ROUND(quantile_disc(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE), 0.1), 6) AS q10,
  ROUND(quantile_disc(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE), 0.5), 6) AS q50,
  ROUND(quantile_disc(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE), 0.9), 6) AS q90,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG ... WITHIN GROUP — Spark
    4's listagg; DuckDB's string_agg with ORDER BY): concatenation
    order is pinned by the key, so the result is deterministic and
    hash-exact. The restriction to a small key range keeps the
    output strings bounded — at scale LISTAGG over unbounded groups
    is an anti-pattern (collect_list explosion); bound the group or
    use arrays."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 60)
    cust.createOrReplaceTempView("sa_cust")
    return spark.sql(
        """
        SELECT c_mktsegment,
               listagg(c_name, '|') WITHIN GROUP (ORDER BY c_custkey)
                 AS names,
               COUNT(*) AS n
        FROM sa_cust
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


STRING_AGG_SQL = """
SELECT c_mktsegment,
       string_agg(c_name, '|' ORDER BY c_custkey) AS names,
       COUNT(*) AS n
FROM customer WHERE c_custkey < 60
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


QUERIES = {
    "cube_revenue": cube_revenue,
    "window_range_frames": window_range_frames,
    "correlated_subquery": correlated_subquery,
    "exists_correlated": exists_correlated,
    "group_quantile_arrays": group_quantile_arrays,
    "string_agg_ordered": string_agg_ordered,
}

ORACLE = {
    "cube_revenue": CUBE_REVENUE_SQL,
    "window_range_frames": WINDOW_RANGE_SQL,
    "correlated_subquery": CORRELATED_SUBQUERY_SQL,
    "exists_correlated": EXISTS_CORRELATED_SQL,
    "group_quantile_arrays": GROUP_QUANTILE_SQL,
    "string_agg_ordered": STRING_AGG_SQL,
}
