"""Test-table loading helpers (driver parquet at /root/testdata/sf*)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Analyzed-relation cache: a production deployment registers each
# table once in a catalog; resolving the same parquet path per query
# re-lists files and re-reads footers for nothing. DataFrames are
# immutable logical plans, so reuse is safe; keyed on the session so
# a fresh SparkSession (driver restart) never sees stale relations.
_RELATION_CACHE: dict = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    df = _RELATION_CACHE.get(key)
    if df is None:
        if name == "events":
            df = load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _RELATION_CACHE[key] = df
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events with a normalized integer-microsecond ``ts_us`` column.

    The driver's events.parquet has shipped with two physical types for
    ``ts``: TIMESTAMP(NANOS) (round 1/2 data — Spark rejects it unless
    ``spark.sql.legacy.parquet.nanosAsLong`` maps it to int64 ns) and
    TIMESTAMP(MICROS) without UTC adjustment (round 3+ data — Spark reads
    TIMESTAMP_NTZ). We detect which we got and expose ``ts_us`` = epoch
    microseconds either way. DuckDB (the correctness oracle) reads the
    same column as its µs TIMESTAMP, so ``epoch_us(ts)`` on the oracle
    side equals ``ts_us`` bit-for-bit: all event-time arithmetic stays in
    exact, timezone-independent integer microseconds (session tz is UTC,
    so the NTZ→LTZ cast in ``unix_micros`` is the identity mapping)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        ts_us = F.expr("ts DIV 1000")  # int64 nanoseconds
    else:
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return df.withColumn("ts_us", ts_us).drop("ts")


US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
