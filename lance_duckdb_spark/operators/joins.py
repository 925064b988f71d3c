"""Join-family operators Spark lacks as built-ins (SURVEY.md §2.B15,
B16, B18, B20): as-of join, range join, gap sessionization, and the
semi/anti-join pattern.

- AS-OF join: DuckDB has ``ASOF JOIN`` natively; Spark does not. We
  implement it as union-tag + per-key ordered window with
  ``last(..., ignorenulls)`` — ONE shuffle on (key), no per-row
  probing, no cross product. At 100 TB this is the only shape that
  survives: the naive inequality-join alternative is quadratic.
- Range join: equi-key + bounded time predicate; Spark executes as
  a sort-merge join on the key with the range as a post-filter. On
  a cluster you'd additionally bucket both sides by
  time-window-of(ts) to bound the merge width.
- Sessionization: lag + cumulative-sum-of-boundaries window, the
  classic two-window formulation; one shuffle on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import US_PER_HOUR, load

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min (shared with the oracle SQL)

# Event time lives in integer nanoseconds (see tables.load_events);
# DuckDB oracles use epoch_us(ts) so both engines do the identical
# int64 arithmetic.


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # dedupe views to one per (user_id, ts) so the as-of match is
    # deterministic under timestamp ties (DuckDB ASOF picks an
    # arbitrary row among equal v.ts otherwise)
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("view_id"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", F.col("event_id").alias("purchase_id")
    )
    v = views.select(
        "user_id",
        "ts_us",
        "view_id",
        F.lit(0).alias("is_p"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    p = purchases.select(
        "user_id",
        "ts_us",
        F.lit(None).cast("long").alias("view_id"),
        F.lit(1).alias("is_p"),
        "purchase_id",
    )
    # views sort before purchases at equal ts (is_p asc) => v.ts <= p.ts
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_us"), F.asc("is_p"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        v.unionByName(p)
        .withColumn("prior_view_id", F.last("view_id", ignorenulls=True).over(w))
        .where(F.col("is_p") == 1)
        .select("purchase_id", "user_id", "prior_view_id")
        .orderBy("purchase_id")
    )


ASOF_JOIN_SQL = """
WITH v AS (
  SELECT user_id, epoch_us(ts) AS ts_us, MAX(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, epoch_us(ts)
),
p AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, v.view_id AS prior_view_id
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts_us <= p.ts_us
ORDER BY p.purchase_id
"""


def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("p_ts"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts_us").alias("v_ts"),
    )
    joined = purchases.join(
        views,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.lit(US_PER_HOUR))
        & (F.col("v_ts") <= F.col("p_ts")),
        "left",
    )
    return (
        joined.groupBy("purchase_id")
        .agg(F.count("view_id").alias("n_views_1h"))
        .orderBy("purchase_id")
    )


RANGE_JOIN_SQL = f"""
SELECT p.event_id AS purchase_id, COUNT(v.event_id) AS n_views_1h
FROM events p
LEFT JOIN events v
  ON v.event_type = 'view'
 AND v.user_id = p.user_id
 AND epoch_us(v.ts) >= epoch_us(p.ts) - {US_PER_HOUR}
 AND epoch_us(v.ts) <= epoch_us(p.ts)
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
ORDER BY purchase_id
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    with_gap = ev.withColumn("prev_ts", F.lag("ts_us").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts_us") - F.col("prev_ts") > SESSION_GAP_US),
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    sessions = with_gap.withColumn("session_idx", F.sum("is_new").over(w_cum))
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        )
        .orderBy("user_id", "session_idx")
    )


SESSIONIZE_SQL = f"""
WITH g AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
s AS (
  SELECT user_id, ts_us, event_id,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM g
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM s
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


def anti_semi_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    nation = load(spark, sf_dir, "nation")
    active = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    inactive = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )
    # hint the BUILD side: a LEFT OUTER join cannot build its
    # preserved (left) side, so F.broadcast(nation) there was a
    # silent no-op (Spark logs and discards the hint; r5 review
    # finding) — the tiny per-nation aggregates are the
    # broadcastable sides
    return (
        nation
        .join(
            F.broadcast(active),
            nation.n_nationkey == active.c_nationkey,
            "left",
        )
        .drop("c_nationkey")
        .join(
            F.broadcast(inactive),
            nation.n_nationkey == inactive.c_nationkey,
            "left",
        )
        .select(
            "n_name",
            F.coalesce("n_active", F.lit(0)).alias("n_active"),
            F.coalesce("n_inactive", F.lit(0)).alias("n_inactive"),
        )
        .orderBy("n_name")
    )


ANTI_SEMI_SQL = """
WITH cnt AS (
  SELECT o_custkey, COUNT(*) AS c FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY o_custkey
)
SELECT n_name,
  COUNT(CASE WHEN cnt.c > 0 THEN 1 END) AS n_active,
  COUNT(CASE WHEN c_custkey IS NOT NULL AND cnt.c IS NULL THEN 1 END) AS n_inactive
FROM nation
LEFT JOIN customer ON c_nationkey = n_nationkey
LEFT JOIN cnt ON o_custkey = c_custkey
GROUP BY n_name
ORDER BY n_name
"""


QUERIES = {
    "asof_join_events_orders": asof_join_events_orders,
    "range_join_events": range_join_events,
    "sessionize_events": sessionize_events,
    "anti_semi_joins": anti_semi_joins,
}

ORACLE = {
    "asof_join_events_orders": ASOF_JOIN_SQL,
    "range_join_events": RANGE_JOIN_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "anti_semi_joins": ANTI_SEMI_SQL,
}
