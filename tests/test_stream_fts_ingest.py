"""Streaming FTS index maintenance (D10, streaming/jobs.py): the
streamed-in dataset serves an extend-maintained BM25 index whose
search is BIT-IDENTICAL to a full-corpus rebuild (FTS maintenance is
exact, unlike the vector ingest's recall-bounded deltas). Oracle
equality on the real testdata is covered by test_correctness.py."""

from __future__ import annotations

import os

import pytest

from lance_duckdb_spark.streaming.jobs import _STREAM_WORKDIR, stream_fts_ingest


@pytest.fixture(scope="module")
def result_rows(spark, sf_dir):
    return stream_fts_ingest(spark, sf_dir).collect()


def test_streamed_index_equals_full_build(spark, sf_dir, result_rows):
    from lance_duckdb_spark.operators.fts import fts_bm25

    direct = fts_bm25(spark, sf_dir).collect()
    assert [r.asDict() for r in result_rows] == [r.asDict() for r in direct]


def test_streamed_index_meta_has_two_posting_dirs(
    spark, sf_dir, result_rows
):
    """One extend generation over two posting dirs, all reachable
    from the published meta (the r8 atomic-snapshot layout; r10
    folded the two streamed sixths into one streamed third — the
    multi-generation extend discipline is covered by
    fts_bm25_incremental / test_fts_incremental.py)."""
    from lance_duckdb_spark.operators.fts import _read_fts_meta

    tag = os.path.basename(sf_dir.rstrip("/"))
    index_dir = os.path.join(_STREAM_WORKDIR, tag, "ftsingestdst.lance.ftsidx")
    meta = _read_fts_meta(index_dir)
    assert meta["version"] == 1
    assert len(meta["postings_dirs"]) == 2
    prefixes = ("postings", "_postings_d1")
    for d, pre in zip(meta["postings_dirs"], prefixes):
        assert d.startswith(pre)
        assert os.path.isdir(os.path.join(index_dir, d))
