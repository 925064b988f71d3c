"""Recoverable spill stages (materialize.py): roundtrip, release,
and the purge guard — a purge must only reclaim children matching
the label-uuid spill naming pattern, never unrelated data sharing
the configured root (r7 ADVICE)."""

from __future__ import annotations

import os

from lance_duckdb_spark.materialize import (
    purge_spill_root,
    release_spill,
    spill_to_parquet,
)


def test_spill_roundtrip_and_release(spark):
    df = spark.range(100).withColumnRenamed("id", "v")
    staged = spill_to_parquet(df, label="unit")
    assert staged.count() == 100
    path = staged._spill_path
    assert os.path.isdir(path)
    release_spill(staged)
    assert not os.path.exists(path)
    release_spill(staged)  # idempotent no-op


def test_purge_only_reclaims_spill_pattern_children(spark, tmp_path):
    root = str(tmp_path / "shared_dfs_dir")
    os.makedirs(root)
    # unrelated data a user parked in the same directory
    keep_dir = os.path.join(root, "user_tables")
    os.makedirs(keep_dir)
    with open(os.path.join(keep_dir, "data.txt"), "w") as fh:
        fh.write("precious")
    keep_file = os.path.join(root, "notes.md")
    with open(keep_file, "w") as fh:
        fh.write("also precious")
    spark.conf.set("spark.lance_duckdb_spark.spillDir", root)
    try:
        staged = spill_to_parquet(spark.range(10), label="stage")
        spill_path = staged._spill_path
        assert os.path.dirname(spill_path) == root
        staged.count()
        purge_spill_root(spark)
        assert not os.path.exists(spill_path)  # spill reclaimed
        assert os.path.isdir(keep_dir)  # unrelated dir survives
        assert os.path.isfile(keep_file)  # unrelated file survives
        assert open(os.path.join(keep_dir, "data.txt")).read() == "precious"
    finally:
        spark.conf.unset("spark.lance_duckdb_spark.spillDir")
