"""Scalar index: fragment pruning, exactness vs full filter scan,
range probes, staleness, empty-result handling."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.sources import lance_format as lf
from lance_duckdb_spark.sources import scalar_index as si
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.tables import load

N_FRAGMENTS = 8


@pytest.fixture(scope="module")
def ds_root(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sidx") / "docs.lance")
    register(spark)
    docs = load(spark, sf_dir, "documents")
    # doc_id-ordered fragments: lang is uncorrelated with layout, a
    # rare planted value lands in few fragments
    marked = docs.withColumn(
        "lang_t",
        F.when(F.col("doc_id") % 1000 == 7, F.lit("xx")).otherwise(
            F.col("lang")
        ),
    ).drop("lang")
    marked.repartitionByRange(N_FRAGMENTS, "doc_id").write.format(
        "lance"
    ).mode("overwrite").save(root)
    si.build_scalar_index(spark, root, "lang_t")
    si.build_scalar_index(spark, root, "n_chars")
    return root


def _fragments_for(spark, root, column, eq):
    meta = si.read_scalar_index_meta(root, column)
    entries = spark.read.parquet(
        os.path.join(si._index_dir(root, column), meta["entries_dir"])
    )
    return {
        r.fragment
        for r in entries.where(F.col("value") == eq)
        .select("fragment")
        .distinct()
        .collect()
    }


def test_rare_value_prunes_fragments(spark, ds_root):
    total = len(lf.read_manifest(ds_root).fragments)
    assert total == N_FRAGMENTS
    kept = _fragments_for(spark, ds_root, "lang_t", "xx")
    assert 0 < len(kept) < total  # the planted value is rare


def test_eq_scan_equals_full_filter(spark, ds_root):
    via_index = (
        si.scalar_index_scan(spark, ds_root, "lang_t", eq="xx")
        .select("doc_id")
        .collect()
    )
    full = (
        spark.read.format("lance")
        .load(ds_root)
        .where(F.col("lang_t") == "xx")
        .select("doc_id")
        .collect()
    )
    assert sorted(r.doc_id for r in via_index) == sorted(
        r.doc_id for r in full
    )
    assert via_index  # planted rows exist


def test_range_scan_equals_full_filter(spark, ds_root):
    via_index = (
        si.scalar_index_scan(spark, ds_root, "n_chars", lo=100, hi=200)
        .select("doc_id")
        .collect()
    )
    full = (
        spark.read.format("lance")
        .load(ds_root)
        .where(F.col("n_chars").between(100, 200))
        .select("doc_id")
        .collect()
    )
    assert sorted(r.doc_id for r in via_index) == sorted(
        r.doc_id for r in full
    )


def test_missing_value_scans_nothing(spark, ds_root):
    out = si.scalar_index_scan(spark, ds_root, "lang_t", eq="zz-none")
    assert out.count() == 0
    assert "doc_id" in out.columns  # schema preserved


def test_unknown_column_and_missing_index(spark, ds_root):
    with pytest.raises(lf.LanceDatasetError, match="no column"):
        si.build_scalar_index(spark, ds_root, "nope")
    with pytest.raises(lf.LanceDatasetError, match="no scalar index"):
        si.scalar_index_scan(spark, ds_root, "source", eq="src0")


def test_staleness_guard_and_allow_stale(spark, sf_dir, ds_root):
    docs = load(spark, sf_dir, "documents").limit(2)
    docs.withColumn(
        # when() keeps the column nullable, matching the dataset schema
        "lang_t",
        F.when(F.col("doc_id").isNotNull(), F.lit("xx")),
    ).drop("lang").write.format("lance").mode("append").save(ds_root)
    with pytest.raises(si.StaleScalarIndexError):
        si.scalar_index_scan(spark, ds_root, "lang_t", eq="xx")
    # allow_stale pins the indexed snapshot: the 2 appended rows are
    # invisible, results equal the pre-append filter scan
    stale = si.scalar_index_scan(
        spark, ds_root, "lang_t", eq="xx", allow_stale=True
    )
    head_version = lf.read_manifest(ds_root).version
    pre = (
        spark.read.format("lance")
        .option("version", str(head_version - 1))
        .load(ds_root)
        .where(F.col("lang_t") == "xx")
    )
    assert stale.count() == pre.count()
