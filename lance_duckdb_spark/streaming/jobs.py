"""Structured Streaming jobs (SURVEY.md §2.D).

The reference exposes a batch-iterator stream scan
(rust/lib.rs:148-188); Spark's native expression of "stream of
batches over a growing dataset" is Structured Streaming. Jobs here
run over the lance stream source (sources/datasource.py
LanceStreamReader — micro-batch per appended fragment set) or any
other streaming DataFrame.

- ``windowed_counts``: tumbling 1-hour counts/sums per event_type
  with a 10-minute watermark. The watermark bounds state: at 100 TB
  /day ingest, state is O(active windows × event types), not O(rows).
- ``stateful_sessions``: gap-based sessionization via
  ``applyInPandasWithState`` — per-user state survives across
  micro-batches, the one shape plain windowed aggregation cannot
  express incrementally.
- ``batch_windowed_counts``: the same windowed aggregation as a
  batch query (integer-µs arithmetic) — the driver-checkable oracle
  twin; tests assert stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.common import money
from ..tables import US_PER_HOUR, load

WATERMARK = "10 minutes"


def with_event_time(df: DataFrame) -> DataFrame:
    """ts_us (int64 µs) → a proper timestamp column for watermarking."""
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def windowed_counts_stream(events: DataFrame) -> DataFrame:
    """Streaming tumbling-window aggregation with watermark."""
    return (
        with_event_time(events)
        .withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def batch_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of windowed_counts_stream, in exact integer-µs
    arithmetic (window id = hours since epoch) so DuckDB can oracle
    it engine-independently."""
    ev = load(spark, sf_dir, "events")
    hour_idx = F.expr(f"ts_us DIV {US_PER_HOUR}").alias("hour_idx")
    return (
        ev.groupBy(hour_idx, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("sum_value"),
        )
        .orderBy("hour_idx", "event_type")
    )


BATCH_WINDOWED_COUNTS_SQL = """
SELECT epoch_us(ts) // 3600000000 AS hour_idx, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour_idx, event_type
"""

SESSION_GAP_US = 30 * 60 * 1_000_000


def stateful_sessions_stream(events: DataFrame) -> DataFrame:
    """Per-user gap sessionization with explicit state across
    micro-batches (applyInPandasWithState). Emits one row per closed
    or in-flight session per update."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    output_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_sessions", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_ts", LongType()),
            StructField("n_sessions", LongType()),
            StructField("n_events", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        ts = []
        for pdf in pdfs:
            ts.extend(pdf["ts_us"].tolist())
        ts.sort()
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for t in ts:
            if last_ts is None or t - last_ts > SESSION_GAP_US:
                n_sessions += 1
            last_ts = t
            n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return (
        events.select("user_id", "ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE gap-session operator (F.session_window) — the
    built-in expression of what joins.sessionize_events does with
    window functions. Session bounds are emitted as integer µs
    (unix_micros is timezone-independent) so the DuckDB oracle can
    reproduce them exactly: start = min(ts), end = max(ts) + gap.

    In streaming this same groupBy(session_window(...)) is
    incrementally maintained with watermark-based state eviction —
    the batch/stream unification is the point of using the native
    operator."""
    ev = with_event_time(load(spark, sf_dir, "events"))
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("start_us"),
            F.unix_micros("w.end").alias("end_us"),
            "n_events",
        )
        .orderBy("user_id", "start_us")
    )


SESSION_WINDOW_NATIVE_SQL = """
WITH g AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
s AS (
  SELECT user_id, ts_us,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM g
)
SELECT user_id, MIN(ts_us) AS start_us,
       MAX(ts_us) + 1800000000 AS end_us,
       COUNT(*) AS n_events
FROM s
GROUP BY user_id, session_idx
ORDER BY user_id, start_us
"""


QUERIES = {
    "stream_windowed_counts": batch_windowed_counts,
    "session_window_native": session_window_native,
}

ORACLE = {
    "stream_windowed_counts": BATCH_WINDOWED_COUNTS_SQL,
    "session_window_native": SESSION_WINDOW_NATIVE_SQL,
}
