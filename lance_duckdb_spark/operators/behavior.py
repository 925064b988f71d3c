"""Behavioral analytics over the events stream (SURVEY.md §2.B31-32):
cohort retention and ordered funnels — the event-analytics shapes a
lance-duckdb user writes in SQL daily. All event time in exact
integer µs (see tables.load_events).

Scale: both are two narrow keyed aggregations over (user, day) —
one shuffle on user_id, then one on the small cohort/step matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import US_PER_DAY, load


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users grouped by first-seen day; how many are active again N
    days later."""
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr(f"ts_us DIV {US_PER_DAY}").alias("day")
    ).distinct()
    # cohort_day as a per-user window MIN over `days`, not a separate
    # groupBy(min) joined back: the optimizer collapsed the join
    # branch's distinct+min into a different aggregate
    # (groupBy(user_id) directly over the scan), so the two subtrees
    # never canonicalized and the executed plan scanned events TWICE
    # and shuffled twice (r14 sweep). The window consumes the one
    # distinct (user_id, day) frame — one events scan, one extra
    # user_id exchange, identical rows (min over the same per-user
    # day set the join attached).
    joined = days.withColumn(
        "cohort_day", F.min("day").over(Window.partitionBy("user_id"))
    ).withColumn(
        "offset_days", (F.col("day") - F.col("cohort_day")).cast("int")
    )
    return (
        joined.groupBy(
            F.date_from_unix_date(F.col("cohort_day").cast("int")).alias("cohort"),
            "offset_days",
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort", "offset_days")
    )


COHORT_RETENTION_SQL = f"""
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {US_PER_DAY} AS day FROM events
),
first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
)
SELECT DATE '1970-01-01' + CAST(cohort_day AS INT) AS cohort,
       CAST(day - cohort_day AS INT) AS offset_days,
       COUNT(DISTINCT days.user_id) AS n_users
FROM days JOIN first ON days.user_id = first.user_id
GROUP BY 1, 2
ORDER BY cohort, offset_days
"""


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup → view → purchase funnel: per user, the first
    time of each step; a user converts a step only if it happens
    after the previous step's first time."""
    ev = load(spark, sf_dir, "events")
    firsts = (
        ev.where(F.col("event_type").isin("signup", "view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).alias("t_signup"),
            F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).alias("t_view"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts_us"))).alias("t_purchase"),
        )
    )
    did_signup = F.col("t_signup").isNotNull()
    did_view = did_signup & F.col("t_view").isNotNull() & (F.col("t_view") > F.col("t_signup"))
    did_purchase = did_view & F.col("t_purchase").isNotNull() & (F.col("t_purchase") > F.col("t_view"))
    return firsts.agg(
        F.sum(did_signup.cast("int")).cast("long").alias("n_signup"),
        F.sum(did_view.cast("int")).cast("long").alias("n_signup_then_view"),
        F.sum(did_purchase.cast("int")).cast("long").alias("n_full_funnel"),
        F.count(F.lit(1)).alias("n_users_any_step"),
    )


FUNNEL_STEPS_SQL = """
WITH firsts AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
  FROM events
  WHERE event_type IN ('signup', 'view', 'purchase')
  GROUP BY user_id
)
SELECT
  CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view IS NOT NULL
              AND t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_then_view,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view IS NOT NULL
              AND t_view > t_signup AND t_purchase IS NOT NULL
              AND t_purchase > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel,
  COUNT(*) AS n_users_any_step
FROM firsts
"""


QUERIES = {
    "cohort_retention": cohort_retention,
    "funnel_steps": funnel_steps,
}

ORACLE = {
    "cohort_retention": COHORT_RETENTION_SQL,
    "funnel_steps": FUNNEL_STEPS_SQL,
}
