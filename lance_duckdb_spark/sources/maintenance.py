"""Spark-level table maintenance over lance datasets: upsert/merge.

Beyond the reference's scan+write surface, but required for "switch
your tables to this connector" completeness. Upsert = anti-join the
current version against the new keys, union the new rows, commit as
one new version — a single distributed join, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .datasource import register


def upsert(
    spark: SparkSession, root: str, updates: DataFrame, key: str
) -> None:
    """Merge ``updates`` into the dataset at ``root`` by ``key``:
    rows with matching keys are replaced, others appended. Commits
    exactly one new version (readers see pre- or post-merge state,
    never a mix)."""
    register(spark)
    current = spark.read.format("lance").load(root)
    survivors = current.join(updates.select(key), on=key, how="left_anti")
    merged = survivors.unionByName(updates)
    merged.write.format("lance").mode("overwrite").save(root)
