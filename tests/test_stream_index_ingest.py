"""Streaming vector-index ingest (D9, streaming/jobs.py): the
streamed-in dataset serves a delta-maintained IVF index whose search
stays within the recall bound, with >= 2 postings deltas really
published (so the O(append) extend path — not a rebuild — is what
ran). Oracle equality on the real testdata is covered by
test_correctness.py."""

from __future__ import annotations

import pytest

from lance_duckdb_spark.streaming.jobs import stream_index_ingest


@pytest.fixture(scope="module")
def result_rows(spark, sf_dir):
    return stream_index_ingest(spark, sf_dir).collect()


def test_ingest_recall_flag_true(result_rows):
    assert result_rows
    assert all(r["ingest_recall_ok"] for r in result_rows)


def test_ingest_rows_are_exact_topk_shape(result_rows):
    from lance_duckdb_spark.operators.similarity import N_PROBES, TOP_K

    per_probe: dict[int, list] = {}
    for r in result_rows:
        per_probe.setdefault(r["probe_id"], []).append(r)
    assert len(per_probe) == N_PROBES
    for rows in per_probe.values():
        assert sorted(x["rnk"] for x in rows) == list(range(1, TOP_K + 1))


def test_ingest_published_two_deltas(spark, sf_dir, result_rows):
    """The job itself asserts >= 2 delta dirs before returning (a
    rebuild would reset delta_dirs to []); verify the meta survives
    on disk after the run for a subsequent reader."""
    import os

    from lance_duckdb_spark.sources.vector_index import read_index_meta
    from lance_duckdb_spark.streaming.jobs import _STREAM_WORKDIR

    tag = os.path.basename(sf_dir.rstrip("/"))
    dst = os.path.join(_STREAM_WORKDIR, tag, "ingestdst.lance")
    meta = read_index_meta(dst)
    assert len(meta["delta_dirs"]) >= 2
    assert meta["dataset_version"] >= 3  # three sink commits
