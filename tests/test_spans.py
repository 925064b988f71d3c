"""Semantics of the span-level operators (spans.py) on planted data,
plus the registry-level oracle equality which test_correctness.py
already covers for the real testdata."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lance_duckdb_spark.operators import spans


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """Three docs: a and b share an exact 12-token span, c is unique;
    d is shorter than one chunk window."""
    d = tmp_path_factory.mktemp("spans_sf")
    shared = " ".join(f"s{i}" for i in range(12))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "source": pa.array(["web"] * 4),
            "text": pa.array(
                [
                    "alpha beta " + shared + " gamma delta",
                    "one two three " + shared + " four",
                    " ".join(f"u{i}" for i in range(20)),
                    "tiny doc only five tokens here",
                ]
            ),
        }
    )
    pq.write_table(docs, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_span_coverage_planted(spark, planted_dir):
    out = {
        r["doc_id"]: r.asDict()
        for r in spans.dedup_span_coverage(spark, planted_dir).collect()
    }
    # doc 1: 16 tokens, shared 12-token run at positions 2..13 ->
    # duplicated 8-grams start at 2,3,4,5,6 (5 grams), union covers
    # tokens 2..13 = 12 tokens
    assert out[1]["n_tokens"] == 16
    assert out[1]["dup_grams"] == 5
    assert out[1]["covered_tokens"] == 12
    assert abs(out[1]["covered_frac"] - 12 / 16) < 1e-15
    # doc 2: shared run at 3..14, same 5 grams / 12 covered
    assert out[2]["dup_grams"] == 5
    assert out[2]["covered_tokens"] == 12
    # unique docs: zero coverage
    assert out[3]["dup_grams"] == 0 and out[3]["covered_frac"] == 0.0
    assert out[4]["covered_tokens"] == 0


def test_span_coverage_overlap_union_not_double_counted(
    spark, tmp_path
):
    """Two shared spans overlapping inside one doc must union, not
    sum: doc1 repeats doc2's 10-token span twice with a 4-token gap
    shorter than K, so intervals chain."""
    shared = " ".join(f"s{i}" for i in range(10))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "source": pa.array(["web", "web"]),
            "text": pa.array([shared + " x " + shared, shared]),
        }
    )
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = {
        r["doc_id"]: r.asDict()
        for r in spans.dedup_span_coverage(spark, str(tmp_path)).collect()
    }
    # doc1 has 21 tokens; duplicated 8-grams at starts 0..2 and
    # 11..13; union = [0,10] + [11,21] = 10 + 10 ... the 'x' token and
    # the token after it break cleanly: covered = 20, not 6*8=48
    assert out[1]["covered_tokens"] == 20
    assert out[1]["n_tokens"] == 21
    assert out[2]["covered_tokens"] == 10


def test_chunking_covers_and_overlaps(spark, planted_dir):
    rows = spans.chunk_documents(spark, planted_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # short doc -> exactly one truncated chunk
    d4 = by_doc[4]
    assert len(d4) == 1 and d4[0]["chunk_tokens"] == 6
    # chunk ids are dense from 0 and every chunk is non-empty
    for chunks in by_doc.values():
        ids = sorted(c["chunk_id"] for c in chunks)
        assert ids == list(range(len(ids)))
        assert all(c["chunk_tokens"] > 0 for c in chunks)


def test_chunking_stride_math(spark, tmp_path):
    """Window 32 / stride 24. An 80-token doc tiles exactly: starts
    0,24,48 (48+32=80), 3 full chunks. A 90-token doc does NOT tile:
    starts 0,24,48,72 — the final chunk truncates to the 18-token
    tail, so every token is covered (r8: the old full-windows-only
    rule dropped tokens 81..90 entirely)."""
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "source": pa.array(["web", "web"]),
            "text": pa.array(
                [
                    " ".join(f"t{i}" for i in range(80)),
                    " ".join(f"t{i}" for i in range(90)),
                ]
            ),
        }
    )
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    rows = spans.chunk_documents(spark, str(tmp_path)).collect()
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert [r["chunk_id"] for r in d1] == [0, 1, 2]
    assert all(r["chunk_tokens"] == 32 for r in d1)
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert [r["chunk_id"] for r in d2] == [0, 1, 2, 3]
    assert [r["chunk_tokens"] for r in d2] == [32, 32, 32, 18]


def test_chunking_covers_every_token(spark, planted_dir):
    """Union of [start, start+chunk_tokens) per doc must equal
    [0, n_tokens) — no unindexed tail anywhere in the corpus."""
    from lance_duckdb_spark.operators.spans import CHUNK_STRIDE
    from lance_duckdb_spark.tables import load
    from pyspark.sql import functions as F

    docs = {
        r["doc_id"]: r["n"]
        for r in load(spark, planted_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id", F.size(F.split(F.trim("text"), " ")).alias("n")
        )
        .collect()
    }
    rows = spans.chunk_documents(spark, planted_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for did, chunks in by_doc.items():
        covered = set()
        for c in chunks:
            start = c["chunk_id"] * CHUNK_STRIDE
            covered.update(range(start, start + c["chunk_tokens"]))
        assert covered == set(range(docs[did])), did
