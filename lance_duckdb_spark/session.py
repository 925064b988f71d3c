"""Tuned SparkSession factory.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the settings
below are the ones we would ship on a real cluster (AQE with
partition coalescing + skew-join handling, Arrow transfers for the
few Pandas-UDF operators). Queries in ``operators/`` never depend on
session config for *correctness* — broadcast decisions are explicit
hints — so they run unchanged under the driver's own session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "lance_duckdb_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # split-size floor: the 4 MB default caps a 12 MB file at 3
        # input splits, idling 29 of 32 cores on every small-file
        # scan. 256 KB lets bytesPerCore drive the split count; at
        # cluster scale files are large, bytesPerCore >> this floor,
        # and maxPartitionBytes (128 MB) governs as usual.
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
