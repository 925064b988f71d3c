"""Write-time bloom side files: pruning on equality probes, false
results impossible, conservative behavior, filter unit tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.sources import lance_format as lf
from lance_duckdb_spark.sources.datasource import (
    EqualTo,
    LanceScanReader,
    register,
)
from lance_duckdb_spark.tables import load


def test_bloom_unit_membership():
    b = lf.build_bloom(["a", "bb", 42, None])
    assert lf.bloom_may_contain(b, "a")
    assert lf.bloom_may_contain(b, "bb")
    assert lf.bloom_may_contain(b, 42)
    # 1000 absent probes: ~1% fpp, never all positive
    misses = sum(
        not lf.bloom_may_contain(b, f"absent-{i}") for i in range(1000)
    )
    assert misses > 950


@pytest.fixture(scope="module")
def bloom_root(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloom") / "docs.lance")
    register(spark)
    docs = load(spark, sf_dir, "documents").withColumn(
        "fp", F.md5(F.col("doc_id").cast("string"))
    )
    (
        docs.repartitionByRange(8, "doc_id")
        .write.format("lance")
        .option("bloom_columns", "fp")
        .mode("overwrite")
        .save(root)
    )
    return root


def test_fragments_carry_bloom_files(bloom_root):
    man = lf.read_manifest(bloom_root)
    assert len(man.fragments) == 8
    assert all(f.bloom_file for f in man.fragments)


def test_point_probe_plans_one_fragment(spark, bloom_root):
    from pyspark.sql.types import StructType

    import json as _json

    man = lf.read_manifest(bloom_root)
    schema = StructType.fromJson(_json.loads(man.schema_json))
    probe = hashlib.md5(b"7").hexdigest()
    reader = LanceScanReader(bloom_root, schema, None)
    reader.pushed = [EqualTo(("fp",), probe)]
    parts = reader.partitions()
    # bloom prunes to the one fragment holding doc 7 (false
    # positives could admit a second — never all 8)
    assert 1 <= len(parts) <= 2


def test_probe_results_exact(spark, bloom_root):
    probe = hashlib.md5(b"7").hexdigest()
    rows = (
        spark.read.format("lance")
        .load(bloom_root)
        .where(F.col("fp") == probe)
        .select("doc_id")
        .collect()
    )
    assert [r.doc_id for r in rows] == [7]


def test_absent_probe_scans_nothing_but_returns_empty(spark, bloom_root):
    rows = (
        spark.read.format("lance")
        .load(bloom_root)
        .where(F.col("fp") == "0" * 32)
        .collect()
    )
    assert rows == []


def test_unbloomed_column_unaffected(spark, bloom_root):
    n = (
        spark.read.format("lance")
        .load(bloom_root)
        .where(F.col("source") == "src0")
        .count()
    )
    assert n > 0


def test_numeric_type_drift_cannot_prune_wrongly():
    """int literal probing a float column (and vice versa) must HIT:
    both sides canonicalize numerics through repr(float(v)) inside
    _bloom_hashes, so SQL's value-based equality survives literal
    type drift (r4 ADVICE — str() agreement alone would wrongly
    prune when the pushed literal isn't cast-folded)."""
    b = lf.build_bloom([5.0, 7.5, 1000000.0])
    assert lf.bloom_may_contain(b, 5)       # int probe vs float stored
    assert lf.bloom_may_contain(b, 5.0)
    bi = lf.build_bloom([5, 7, 10])
    assert lf.bloom_may_contain(bi, 5.0)    # float probe vs int stored
    from decimal import Decimal

    assert lf.bloom_may_contain(bi, Decimal("7"))
    assert lf.bloom_may_contain(lf.build_bloom([True, False]), 1)


def test_unversioned_bloom_never_prunes():
    """A bloom side file written before the canonicalization version
    stamp existed (r5: numerics hashed str(v), not repr(float(v)))
    must NEVER be probed: the probe would compute different hash
    inputs than the writer and could answer a false negative —
    wrongly pruning a fragment that holds matches (r5 ADVICE).
    Unversioned or version-mismatched blooms always answer True."""
    b = lf.build_bloom([1, 2, 3])
    assert b["canon"] == lf._BLOOM_CANON_VERSION
    legacy = dict(b)
    del legacy["canon"]  # pre-stamp side file
    assert lf.bloom_may_contain(legacy, 999999)  # may-contain, not prune
    future = dict(b, canon=lf._BLOOM_CANON_VERSION + 1)
    assert lf.bloom_may_contain(future, 999999)
    # the stamped bloom still prunes as usual
    assert not lf.bloom_may_contain(b, 999999)
