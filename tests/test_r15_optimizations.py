"""Focused tests for the r15 optimization-pass internals: each change
rearranged HOW an operator computes (spill artifact, pass scope,
exchange count) with a proof obligation that WHAT it computes is
unchanged. These pin the equivalences the round doc claims
(OPTIMIZATION_r15.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lance_duckdb_spark.materialize import spill_to_parquet
from lance_duckdb_spark.operators import dedup
from lance_duckdb_spark.tables import load


# --- dedup_incremental: band-hash spill + candidate-only verify -----


def test_dedup_incremental_band_recut_identical(spark, sf_dir):
    """The r15 re-cut (narrow band-hash spill; verification
    re-shingles only candidate-pair docs) must produce rows
    identical — including the float jaccard — to the r14 shape
    (full-corpus shingle spill threaded through verification),
    reconstructed here inline."""
    docs = load(spark, sf_dir, "documents")

    # the r14 shape, inline: one corpus-wide shingle spill, parity
    # filters for store/batch signatures, full-frame verification
    shingled = spill_to_parquet(dedup._shingle_df(docs), "r15-test-shingles")
    base = dedup._band_hashes(
        dedup._minhash_signatures(shingled.where(F.col("doc_id") % 2 == 0))
    )
    batch = dedup._band_hashes(
        dedup._minhash_signatures(shingled.where(F.col("doc_id") % 2 == 1))
    )
    cand = (
        base.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_hash")
        .join(
            batch.select(
                F.col("doc_id").alias("doc_b"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    old = dedup.verify_candidate_pairs(cand, docs, shingled=shingled).collect()

    new = dedup.dedup_incremental(spark, sf_dir).collect()
    assert [r.asDict() for r in new] == [r.asDict() for r in old]
    assert len(new) > 0  # the fixture corpus has cross-parity dupes


def test_pruned_take_identical_to_full_take(tmp_path):
    """The row-group-pruned positional take must return exactly the
    rows (values AND order) of the full-file read it replaced, for
    positions scattered across / clustered in / skipping row groups,
    and must decode only the groups it hits."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lance_duckdb_spark.operators.lance_ops import _pruned_take

    path = str(tmp_path / "t.parquet")
    n = 100
    tbl = pa.table(
        {
            "a": pa.array(range(n), type=pa.int64()),
            "b": pa.array([f"s{i}" for i in range(n)]),
            "c": pa.array([i * 0.5 for i in range(n)]),
        }
    )
    pq.write_table(tbl, path, row_group_size=10)  # 10 groups
    assert pq.ParquetFile(path).metadata.num_row_groups == 10
    cases = [
        [0, 7, 42, 99],          # scattered
        [3],                      # single
        [10, 11, 19],             # one interior group
        [5, 95],                  # first + last, 8 groups skipped
        list(range(100)),         # everything
    ]
    for phys in cases:
        want = pq.read_table(path, columns=["a", "c"]).take(phys)
        got = _pruned_take(path, ["a", "c"], phys)
        assert got.to_pydict() == want.to_pydict()


def test_verify_candidate_pairs_candidate_restriction_identical(
    spark, sf_dir
):
    """The equivalence the r15 re-cut rests on: restricting the docs
    frame to candidate-pair ids BEFORE verification must change
    nothing — every (doc_a, doc_b) the join emits references only
    candidate docs, and per-doc shingle sets are independent of the
    frame, so sizes/intersections (and the jaccard doubles) are
    identical."""
    docs = load(spark, sf_dir, "documents")
    ids6 = [
        r.doc_id
        for r in docs.select("doc_id").orderBy("doc_id").limit(6).collect()
    ]
    pairs = [
        (ids6[i], ids6[j])
        for i in range(len(ids6))
        for j in range(i + 1, len(ids6))
    ]
    cand = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    full = dedup.verify_candidate_pairs(cand, docs).collect()
    ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    restricted = dedup.verify_candidate_pairs(
        cand, docs.join(ids, "doc_id", "left_semi")
    ).collect()
    assert [r.asDict() for r in restricted] == [r.asDict() for r in full]
