"""Window / rollup / percentile / pivot analytics (SURVEY.md §2.B9-B14,
B17, B19).

These cover the DuckDB SQL surface a lance-duckdb user gets beyond
plain joins+aggs: window functions, GROUPING SETS, ordered-set
aggregates, PIVOT, statistical aggregates.

Scale notes: the only global-ordering windows here (B10 running
totals) operate on *post-aggregation* daily rows — cardinality is
days, not facts — so the single-partition window is fine at any
input scale. Per-key windows (B9) partition by their key and
shuffle once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import US_PER_DAY, load
from .common import MONEY, dsum, money


def top_revenue_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum(money("o_totalprice")).alias("rev_dec"))
    )
    joined = cust.join(rev, cust.c_custkey == rev.o_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("rev_dec"), F.asc("c_custkey")
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            "rnk",
        )
        .orderBy("c_mktsegment", "rnk")
    )


TOP_REVENUE_PER_SEGMENT_SQL = """
SELECT c_mktsegment, c_custkey, CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT c_mktsegment, c_custkey, rev_dec,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY rev_dec DESC, c_custkey ASC) AS rnk
  FROM customer
  JOIN (
    SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
    FROM orders GROUP BY o_custkey
  ) r ON c_custkey = o_custkey
)
WHERE rnk <= 3
ORDER BY c_mktsegment, rnk
"""


def running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(money("o_totalprice")).alias("rev_dec"))
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_ma = Window.orderBy("d").rowsBetween(-6, 0)
    return (
        daily.select(
            "d",
            F.col("rev_dec").cast("double").alias("day_rev"),
            F.sum("rev_dec").over(w_cum).cast("double").alias("cum_rev"),
            (
                F.sum("rev_dec").over(w_ma).cast("double")
                / F.count(F.lit(1)).over(w_ma)
            ).alias("ma7"),
        )
        .orderBy("d")
    )


RUNNING_TOTALS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
  FROM orders GROUP BY 1
)
SELECT d,
  CAST(rev_dec AS DOUBLE) AS day_rev,
  CAST(SUM(rev_dec) OVER (ORDER BY d
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_rev,
  CAST(SUM(rev_dec) OVER (ORDER BY d
       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
    / COUNT(*) OVER (ORDER BY d
       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
FROM daily
ORDER BY d
"""


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two countDistincts + plain aggregates over one group key.
    Split into three single-kind aggregations joined on the 3-row
    status key (r5): mixing N distinct aggregates with plain ones
    makes Catalyst rewrite the whole aggregation through Expand —
    N+1 input replicas through the shuffle (sf1: 4.6s; split: each
    distinct agg shuffles only its own (status, value) pairs after
    map-side partial dedup, ~1.5s)."""
    orders = load(spark, sf_dir, "orders")
    plain = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(money("o_totalprice"), "total_price"),
    )
    cust = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust")
    )
    days = orders.groupBy("o_orderstatus").agg(
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_days")
    )
    return (
        plain.join(F.broadcast(cust), "o_orderstatus")
        .join(F.broadcast(days), "o_orderstatus")
        .select(
            "o_orderstatus", "n_cust", "n_days", "n_orders", "total_price"
        )
        .orderBy("o_orderstatus")
    )


DISTINCT_COUNTS_SQL = """
SELECT o_orderstatus,
  COUNT(DISTINCT o_custkey) AS n_cust,
  COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").alias("o_year"),
            money("o_totalprice").alias("price_dec"),
        )
    )
    return (
        base.rollup("n_name", "o_year")
        .agg(dsum("price_dec", "revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.asc_nulls_first("n_name"), F.asc_nulls_first("o_year")
        )
    )


ROLLUP_REVENUE_SQL = """
SELECT n_name, o_year,
  CAST(SUM(price_dec) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM (
  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
GROUP BY ROLLUP (n_name, o_year)
ORDER BY n_name ASC NULLS FIRST, o_year ASC NULLS FIRST
"""


def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.round(F.percentile("c_acctbal", F.lit(0.5)), 6).alias("p50_acctbal"),
            F.round(F.percentile("c_acctbal", F.lit(0.9)), 6).alias("p90_acctbal"),
            F.round(F.percentile("c_acctbal", F.lit(0.99)), 6).alias("p99_acctbal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
        .orderBy("c_mktsegment")
    )


PERCENTILES_SQL = """
SELECT c_mktsegment,
  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY c_acctbal), 6) AS p50_acctbal,
  ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY c_acctbal), 6) AS p90_acctbal,
  ROUND(percentile_cont(0.99) WITHIN GROUP (ORDER BY c_acctbal), 6) AS p99_acctbal,
  COUNT(*) AS n_cust
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        )
        .orderBy("l_returnflag")
    )


STATS_MOMENTS_SQL = """
SELECT l_returnflag,
  ROUND(stddev_samp(l_quantity), 6) AS std_qty,
  ROUND(var_samp(l_quantity), 6) AS var_qty,
  ROUND(stddev_samp(l_extendedprice), 4) AS std_price,
  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
  ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

def robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation (MAD) per segment — the two-pass
    robust-statistics shape: group medians, then the median of
    absolute deviations from them. Outlier-resistant counterpart to
    stats_moments; both passes are exact percentiles, rounded 6."""
    cust = load(spark, sf_dir, "customer")
    med = cust.groupBy("c_mktsegment").agg(
        F.percentile("c_acctbal", F.lit(0.5)).alias("med_bal")
    )
    dev = cust.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment",
        "c_acctbal",
        F.abs(F.col("c_acctbal") - F.col("med_bal")).alias("adev"),
        "med_bal",
    )
    return (
        dev.groupBy("c_mktsegment")
        .agg(
            F.round(F.first("med_bal"), 6).alias("median_bal"),
            F.round(F.percentile("adev", F.lit(0.5)), 6).alias("mad_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
        .orderBy("c_mktsegment")
    )


ROBUST_STATS_SQL = """
WITH med AS (
  SELECT c_mktsegment,
    percentile_cont(0.5) WITHIN GROUP (ORDER BY c_acctbal) AS med_bal
  FROM customer GROUP BY c_mktsegment
)
SELECT c.c_mktsegment AS c_mktsegment,
  ROUND(MIN(med_bal), 6) AS median_bal,
  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(c_acctbal - med_bal)), 6) AS mad_bal,
  COUNT(*) AS n_cust
FROM customer c JOIN med ON c.c_mktsegment = med.c_mktsegment
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # ts_ns is int64 nanoseconds (tables.load_events); derive the
    # calendar day tz-independently via exact integer division (a
    # double divide would lose precision above 2^53 µs).
    day = F.date_from_unix_date(
        F.expr(f"CAST(ts_us DIV {US_PER_DAY} AS INT)")
    ).alias("d")
    pivoted = (
        ev.groupBy(day)
        .pivot("event_type", EVENT_TYPES)
        .agg(F.sum(money("value")).cast("double"))
    )
    return pivoted.select(
        "d", *[F.col(k).alias(f"{k}_sum") for k in EVENT_TYPES]
    ).orderBy("d")


_pivot_cols = ",\n  ".join(
    f"CAST(SUM(CASE WHEN event_type = '{k}' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS {k}_sum"
    for k in EVENT_TYPES
)
PIVOT_EVENTS_SQL = f"""
SELECT DATE '1970-01-01' + CAST(epoch_us(ts) // {US_PER_DAY} AS INT) AS d,
  {_pivot_cols}
FROM events
GROUP BY 1
ORDER BY d
"""


# Error budgets for the hashed accuracy flags below. approx_percentile
# at accuracy 10000 bounds rank error to n/10000 (effectively exact on
# these distributions); approx_count_distinct (HLL++, rsd 0.05) has a
# ~5% standard error. The flags assert a comfortable multiple of the
# expected error so the driver hash turns a quality regression into a
# visible mismatch without being flaky (measured errors: percentile
# <0.1%, distinct <3% at sf0.001-1).
APPROX_PCT_RELTOL = 0.01
APPROX_DISTINCT_RELTOL = 0.15


def approx_quantiles_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-exact accuracy audit, restructured for the driver's
    hash compare (r5): the engine-specific sketch VALUES
    (approx_percentile / HLL++ approx_count_distinct have no DuckDB
    bit-twin) are folded into deterministic boolean accuracy flags —
    |approx - exact| within the stated relative tolerance — while the
    exact sides are the hashed numeric columns. The oracle computes
    the exact sides and asserts the flags literally TRUE, so a sketch
    accuracy regression breaks the driver hash instead of hiding in a
    rows-only row."""
    orders = load(spark, sf_dir, "orders")
    # multiplication form: |approx-exact| <= tol*|exact| avoids the
    # exact==0 division (NULL flag vs the oracle's literal TRUE) —
    # at exact==0 the flag requires approx==0 (r5 review finding)
    within = lambda approx, exact, tol: (  # noqa: E731
        F.abs(approx - exact) <= tol * F.abs(exact)
    )
    # the percentile aggregates and the distinct aggregates run as
    # SEPARATE aggregations joined by a broadcast 1-row crossJoin:
    # mixing countDistinct with non-distinct aggregates makes
    # Catalyst rewrite the whole aggregation through Expand
    # (one extra input replica per distinct group), which at sf1
    # multiplied the exact-percentile buffer traffic into a 175 s
    # aggregation; split, it's 2 independent single-pass aggs
    pct = orders.agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50_exact"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_exact"),
        within(
            F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)),
            F.percentile("o_totalprice", F.lit(0.5)),
            APPROX_PCT_RELTOL,
        ).alias("p50_within_tol"),
        within(
            F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)),
            F.percentile("o_totalprice", F.lit(0.9)),
            APPROX_PCT_RELTOL,
        ).alias("p90_within_tol"),
    )
    dst = orders.agg(
        F.countDistinct("o_custkey").alias("n_cust_exact"),
        within(
            F.approx_count_distinct("o_custkey").cast("double"),
            F.countDistinct("o_custkey").cast("double"),
            APPROX_DISTINCT_RELTOL,
        ).alias("distinct_within_tol"),
    )
    return pct.crossJoin(F.broadcast(dst)).select(
        "p50_exact",
        "p90_exact",
        "n_cust_exact",
        "p50_within_tol",
        "p90_within_tol",
        "distinct_within_tol",
    )


APPROX_QUANTILES_SQL = """
SELECT
  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 6) AS p50_exact,
  ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 6) AS p90_exact,
  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust_exact,
  TRUE AS p50_within_tol,
  TRUE AS p90_within_tol,
  TRUE AS distinct_within_tol
FROM orders
"""


QUERIES = {
    "top_revenue_per_segment": top_revenue_per_segment,
    "running_totals": running_totals,
    "distinct_counts": distinct_counts,
    "rollup_revenue": rollup_revenue,
    "percentiles": percentiles,
    "stats_moments": stats_moments,
    "robust_stats": robust_stats,
    "pivot_events": pivot_events,
    "approx_quantiles_vs_exact": approx_quantiles_vs_exact,
}

ORACLE = {
    "top_revenue_per_segment": TOP_REVENUE_PER_SEGMENT_SQL,
    "running_totals": RUNNING_TOTALS_SQL,
    "distinct_counts": DISTINCT_COUNTS_SQL,
    "rollup_revenue": ROLLUP_REVENUE_SQL,
    "percentiles": PERCENTILES_SQL,
    "stats_moments": STATS_MOMENTS_SQL,
    "robust_stats": ROBUST_STATS_SQL,
    "pivot_events": PIVOT_EVENTS_SQL,
    "approx_quantiles_vs_exact": APPROX_QUANTILES_SQL,
}
