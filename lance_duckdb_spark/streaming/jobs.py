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


QUERIES = {
    "stream_windowed_counts": batch_windowed_counts,
}

ORACLE = {
    "stream_windowed_counts": BATCH_WINDOWED_COUNTS_SQL,
}
