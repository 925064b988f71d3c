"""Scale smoke (SURVEY.md §6): amplify the corpus ~20x and verify
the candidate-bounded dedup path still (a) completes in bounded
time and (b) finds the planted cross-copy duplicates — the
empirical check that the LSH equi-join shape, not an all-pairs
scan, is doing the work.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.operators.dedup import MINHASH_JACCARD_T, dedup_minhash_lsh
from lance_duckdb_spark.tables import load


@pytest.fixture(scope="module")
def amplified_dir(spark, sf_dir, tmp_path_factory):
    """documents x20: each copy keeps the text (same shingle set, so
    copies of one doc are jaccard-1.0 near-dups) under distinct
    doc_ids. 500 docs -> 10k docs, ~50x the candidate pressure."""
    out = str(tmp_path_factory.mktemp("amplified"))
    docs = load(spark, sf_dir, "documents")
    copies = F.explode(F.array(*[F.lit(i) for i in range(20)])).alias("copy")
    amplified = (
        docs.select("*", copies)
        .withColumn("doc_id", F.col("doc_id") * 20 + F.col("copy"))
        .drop("copy")
    )
    amplified.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    return out


def test_minhash_scales_and_finds_planted_dups(spark, amplified_dir):
    import time

    t0 = time.perf_counter()
    pairs = dedup_minhash_lsh(spark, amplified_dir).collect()
    elapsed = time.perf_counter() - t0
    # 10k docs => 50M naive pairs; the LSH path must stay far from that
    assert elapsed < 120, f"minhash took {elapsed}s on 10k docs"
    got = {(r.doc_a, r.doc_b) for r in pairs}
    # copies of the same original doc are exact near-dups; the 20
    # copies of doc 0 give 190 within-family pairs — require the
    # family to be found (banding catches jaccard-1.0 always)
    family0 = {(a, b) for a in range(20) for b in range(20) if a < b}
    assert family0 <= got, "planted duplicate family not fully recovered"
    for r in pairs:
        assert r.jaccard >= MINHASH_JACCARD_T
