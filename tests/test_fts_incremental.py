"""Incremental FTS index maintenance (operators/fts.py): extended
index == full rebuild bit-exact, base posting files untouched by the
append, df/stats generations rotate with the two-behind reclaim.
Oracle equality is covered by test_correctness.py."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.operators import fts
from lance_duckdb_spark.tables import load


def _posting_files(index_dir: str) -> set[str]:
    out = set()
    for d in fts._read_fts_meta(index_dir)["postings_dirs"]:
        for root, _dirs, files in os.walk(os.path.join(index_dir, d)):
            for f in files:
                if f.endswith(".parquet"):
                    out.add(os.path.join(root, f))
    return out


@pytest.fixture(scope="module")
def incr_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ftsincr") / "index")
    docs = load(spark, sf_dir, "documents")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = lo + ((hi - lo + 1) * 2) // 3
    fts.build_fts_index(spark, docs.where(F.col("doc_id") < cut), d)
    base_files = _posting_files(d)
    fts.extend_fts_index(spark, d, docs.where(F.col("doc_id") >= cut))
    return d, base_files


def test_extend_appends_never_rewrites(spark, incr_dir):
    d, base_files = incr_dir
    after = _posting_files(d)
    assert base_files <= after  # every base file survives verbatim
    assert len(after) > len(base_files)  # and new files arrived
    # the new files live in a versioned DELTA dir published via meta,
    # never inside the base postings dir (r7 ADVICE: all posting
    # state goes through the atomic _meta.json snapshot; r8: names
    # carry unique suffixes so rebuilds/retries never overwrite)
    meta = fts._read_fts_meta(d)
    assert len(meta["postings_dirs"]) == 2
    base_dir, delta_dir = meta["postings_dirs"]
    assert base_dir.startswith("postings")
    assert delta_dir.startswith("_postings_d1")
    assert all(
        os.path.join(d, delta_dir) in f for f in after - base_files
    )


def test_crashed_extend_is_invisible_then_retry_replaces(
    spark, sf_dir, tmp_path_factory, monkeypatch
):
    """A crash between the postings-delta write and the meta publish
    must leave search untouched (the orphan delta is unreferenced),
    and the RETRIED extend must replace — not double-append — the
    orphan, landing bit-identical to a clean extend."""
    d = str(tmp_path_factory.mktemp("ftscrash") / "index")
    docs = load(spark, sf_dir, "documents")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = lo + ((hi - lo + 1) * 2) // 3
    bulk = docs.where(F.col("doc_id") < cut)
    tail = docs.where(F.col("doc_id") >= cut)
    fts.build_fts_index(spark, bulk, d)
    bulk_hits = fts.search_bm25(spark, d, list(fts.QUERY_TERMS)).collect()

    def boom(index_dir, meta):
        raise RuntimeError("crash before publish")

    monkeypatch.setattr(fts, "_publish_fts_meta", boom)
    with pytest.raises(RuntimeError, match="crash before publish"):
        fts.extend_fts_index(spark, d, tail)
    monkeypatch.undo()
    # orphan delta exists but no reader sees it
    orphans = [
        e for e in os.listdir(d) if e.startswith("_postings_d1")
    ]
    assert len(orphans) == 1
    meta0 = fts._read_fts_meta(d)
    assert len(meta0["postings_dirs"]) == 1
    assert orphans[0] not in meta0["postings_dirs"]
    crashed_hits = fts.search_bm25(spark, d, list(fts.QUERY_TERMS)).collect()
    assert [r.asDict() for r in crashed_hits] == [
        r.asDict() for r in bulk_hits
    ]
    # retry: stages its OWN fresh dir; only the published one is
    # ever scanned — no double counting
    fts.extend_fts_index(spark, d, tail)
    full = str(tmp_path_factory.mktemp("ftscrashfull") / "index")
    fts.build_fts_index(spark, docs, full)
    a = fts.search_bm25(spark, d, list(fts.QUERY_TERMS)).collect()
    b = fts.search_bm25(spark, full, list(fts.QUERY_TERMS)).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_extended_equals_full_rebuild_bit_exact(
    spark, sf_dir, incr_dir, tmp_path_factory
):
    d, _ = incr_dir
    full = str(tmp_path_factory.mktemp("ftsfull") / "index")
    fts.build_fts_index(spark, load(spark, sf_dir, "documents"), full)
    a = fts.search_bm25(spark, d, list(fts.QUERY_TERMS)).collect()
    b = fts.search_bm25(spark, full, list(fts.QUERY_TERMS)).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_generation_rotation_and_reclaim(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ftsrot") / "index")
    docs = load(spark, sf_dir, "documents")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    span = hi - lo + 1
    cuts = [lo, lo + span // 2, lo + (span * 3) // 4, hi + 1]
    fts.build_fts_index(spark, docs.where(F.col("doc_id") < cuts[1]), d)
    for i in (1, 2):
        meta = fts.extend_fts_index(
            spark,
            d,
            docs.where(
                (F.col("doc_id") >= cuts[i]) & (F.col("doc_id") < cuts[i + 1])
            ),
        )
    assert meta["version"] == 2
    assert fts._read_fts_meta(d) == meta
    # stats: the PREVIOUS generation must survive (readers of the old
    # meta), the one two behind must be reclaimed. df: generations
    # are append-only deltas (r10) — ALL live until the next rebuild
    entries = os.listdir(d)
    assert any(e.startswith("_df_v0") for e in entries)
    assert any(e.startswith("_df_v1") for e in entries)
    assert any(e.startswith("_df_v2") for e in entries)
    assert len(meta["df_dirs"]) == 3
    assert any(e.startswith("_stats_v1") for e in entries)
    assert not any(e.startswith("_stats_v0") for e in entries)
    # merged stats are the exact full-corpus integers
    row = spark.read.parquet(os.path.join(d, meta["stats_dir"])).first()
    tf = fts._term_freq(docs)
    n_docs, sum_dl = (
        fts._doc_len(tf)
        .agg(F.count(F.lit(1)), F.sum("dl").cast("long"))
        .first()
    )
    assert (row["n_docs"], row["sum_dl"]) == (n_docs, sum_dl)


def test_empty_extend_is_a_noop_not_a_generation(
    spark, sf_dir, tmp_path_factory
):
    """An empty increment must not publish a new generation: an empty
    delta dir holds no part files and would crash every later search
    on parquet schema inference (r8 review finding)."""
    d = str(tmp_path_factory.mktemp("ftsempty") / "index")
    docs = load(spark, sf_dir, "documents")
    fts.build_fts_index(spark, docs, d)
    before = fts._read_fts_meta(d)
    hits_before = fts.search_bm25(spark, d, list(fts.QUERY_TERMS)).collect()
    meta = fts.extend_fts_index(spark, d, docs.where(F.lit(False)))
    assert meta == before
    assert fts._read_fts_meta(d) == before
    assert not os.path.exists(os.path.join(d, "_postings_d1"))
    hits_after = fts.search_bm25(spark, d, list(fts.QUERY_TERMS)).collect()
    assert [r.asDict() for r in hits_after] == [
        r.asDict() for r in hits_before
    ]


def test_rebuild_compacts_previous_generations(
    spark, sf_dir, tmp_path_factory
):
    """build_fts_index over an extended index is the compaction: every
    dir the fresh meta no longer references must be reclaimed."""
    d = str(tmp_path_factory.mktemp("ftscompact") / "index")
    docs = load(spark, sf_dir, "documents")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = lo + ((hi - lo + 1) * 2) // 3
    fts.build_fts_index(spark, docs.where(F.col("doc_id") < cut), d)
    fts.extend_fts_index(spark, d, docs.where(F.col("doc_id") >= cut))
    assert any(
        e.startswith("_postings_d1") for e in os.listdir(d)
    )
    fts.build_fts_index(spark, docs, d)
    meta = fts._read_fts_meta(d)
    assert len(meta["postings_dirs"]) == 1  # fresh base only
    # the superseded life's dirs SURVIVE this rebuild as stale_dirs
    # (in-flight readers of the previous meta keep their files)...
    for stale in meta["stale_dirs"]:
        assert os.path.isdir(os.path.join(d, stale)), stale
    # ...and the NEXT maintenance op reclaims them
    fts.extend_fts_index(
        spark, d, docs.where(F.col("doc_id") >= cut)
    )
    entries = set(os.listdir(d))
    for stale in meta["stale_dirs"]:
        assert stale not in entries, stale


def test_search_prunes_df_scan_too(spark, sf_dir, tmp_path_factory):
    """Both the postings scan AND the df scan must carry bucket
    partition filters — the df table is corpus-wide term rows and an
    unpruned read of it would scale with vocabulary, not query."""
    d = str(tmp_path_factory.mktemp("ftsprune") / "index")
    fts.build_fts_index(spark, load(spark, sf_dir, "documents"), d)
    term = fts.QUERY_TERMS[0]
    plan = (
        fts.search_bm25(spark, d, [term])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("PartitionFilters: [isnotnull(bucket") >= 2 or (
        plan.count("PartitionFilters") >= 2
        and str(fts.bucket_of(term)) in plan
    )


def test_build_refuses_empty_corpus(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ftsempty2") / "index")
    docs = load(spark, sf_dir, "documents").where(F.lit(False))
    with pytest.raises(ValueError, match="no indexable documents"):
        fts.build_fts_index(spark, docs, d)
