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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    reader rejects outright — we read it with
    ``spark.sql.legacy.parquet.nanosAsLong`` as int64 ns. DuckDB
    (the correctness oracle) truncates the same column to
    microseconds at read time (its TIMESTAMP is µs), so we expose
    ``ts_us`` = ns DIV 1000 and keep ALL event-time arithmetic in
    integer microseconds — exact, timezone-independent, and equal to
    DuckDB's ``epoch_us(ts)`` bit-for-bit."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts_us", F.expr("ts DIV 1000")).drop("ts")


US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
