"""IVF index deltas: append without rebuild, search covers base +
delta, base postings untouched, rewrite history refused."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.operators.similarity import (
    IVF_K,
    N_PROBES,
    TOP_K,
    ann_topk_bruteforce,
)
from lance_duckdb_spark.sources import lance_format as lf
from lance_duckdb_spark.sources import vector_index as vi
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.tables import load


@pytest.fixture(scope="module")
def delta_root(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vdelta") / "emb.lance")
    register(spark)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb.where(F.col("vec_id") % 2 == 0).write.format("lance").mode(
        "overwrite"
    ).save(root)
    vi.build_ivf_index(spark, root, k=IVF_K, lloyd_iters=2)
    # append the odd half, index it as a DELTA (no rebuild)
    emb.where(F.col("vec_id") % 2 == 1).write.format("lance").mode(
        "append"
    ).save(root)
    vi.extend_ivf_index(spark, root)
    return root


def _probes(spark, sf_dir):
    return (
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < N_PROBES)
        .select(F.col("vec_id").alias("probe_id"), "embedding")
    )


def test_delta_registered_and_base_untouched(spark, delta_root):
    meta = vi.read_index_meta(delta_root)
    assert len(meta["delta_dirs"]) == 1
    assert meta["dataset_version"] == lf.read_manifest(delta_root).version
    base = vi._postings_dir(delta_root)
    delta = os.path.join(delta_root, vi.INDEX_DIR, meta["delta_dirs"][0])
    # base holds only even ids (never rewritten), delta only odd
    base_ids = {
        r.vec_id for r in spark.read.parquet(base).select("vec_id").collect()
    }
    delta_ids = {
        r.vec_id for r in spark.read.parquet(delta).select("vec_id").collect()
    }
    assert all(i % 2 == 0 for i in base_ids)
    assert delta_ids and all(i % 2 == 1 for i in delta_ids)


def test_search_covers_appended_vectors_with_recall(
    spark, sf_dir, delta_root
):
    # centroids were fit on the pre-append half only, so appended
    # vectors spread across more buckets — the documented drift cost
    # of a delta (O(append) index time) vs a rebuild (O(corpus)).
    # Lifecycle contract asserted here: the delta'd index keeps
    # usable recall (≥0.8 at nprobe 8/16; measured 0.84), and a full
    # rebuild restores the fresh-index bar (≥0.9 at nprobe 6).
    got = vi.ann_search(
        spark, delta_root, _probes(spark, sf_dir),
        k_neighbors=TOP_K, nprobe=8,
    ).collect()
    found = {(r.probe_id, r.neighbor_id) for r in got}
    assert any(n % 2 == 1 for _, n in found)  # delta vectors searchable
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in ann_topk_bruteforce(spark, sf_dir).collect()
    }
    recall = len(exact & found) / len(exact)
    assert recall >= 0.8, f"post-delta recall {recall}"

    vi.build_ivf_index(spark, delta_root, k=IVF_K, lloyd_iters=2)
    rebuilt = {
        (r.probe_id, r.neighbor_id)
        for r in vi.ann_search(
            spark, delta_root, _probes(spark, sf_dir),
            k_neighbors=TOP_K, nprobe=6,
        ).collect()
    }
    recall2 = len(exact & rebuilt) / len(exact)
    assert recall2 >= 0.9, f"post-rebuild recall {recall2}"


def test_extend_is_noop_at_head(spark, delta_root):
    before = vi.read_index_meta(delta_root)
    after = vi.extend_ivf_index(spark, delta_root)
    assert after == before


def test_rewrite_history_refuses_delta(spark, sf_dir, tmp_path):
    root = str(tmp_path / "rw.lance")
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb.write.format("lance").mode("overwrite").save(root)
    vi.build_ivf_index(spark, root, k=IVF_K, lloyd_iters=1)
    from lance_duckdb_spark.sources.lance_format import delete_where

    import pyarrow.compute as pc

    delete_where(root, pc.field("vec_id") < 5)  # rewrites fragments
    with pytest.raises(lf.LanceDatasetError, match="rewritten"):
        vi.extend_ivf_index(spark, root)


def test_deletion_vector_delete_extend_serves_masked(spark, sf_dir, tmp_path):
    """r14 (was: refuse): a deletion-vector delete keeps fragment
    files but changes deletion state — the extend now TOLERATES it,
    re-pins with ``serve_live_mask`` set, and every later search
    masks the current deletion state even at head == pin (base
    postings still carry the deleted ids — the leak that kept
    extends strict through r13 is closed by the serving gate, not
    by refusing the extend)."""
    import pyarrow.compute as pc
    from pyspark.sql import functions as F

    root = str(tmp_path / "dv.lance")
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb.write.format("lance").mode("overwrite").save(root)
    vi.build_ivf_index(spark, root, k=IVF_K, lloyd_iters=1)
    lf.delete_where(
        root, pc.field("vec_id") < 5, use_deletion_vectors=True
    )
    meta = vi.extend_ivf_index(spark, root)  # pure-DELETE re-pin
    assert meta["serve_live_mask"] is True
    assert meta["dataset_version"] == lf.read_manifest(root).version
    probes = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    # head == pin now, yet the deleted ids must NOT come back
    got = vi.ann_search(
        spark, root, probes, k_neighbors=10, nprobe=8,
        exclude_self=False,
    ).collect()
    assert got
    assert all(r["neighbor_id"] >= 5 for r in got)


def test_rebuild_reclaims_delta_dirs(spark, sf_dir, delta_root):
    """A full rebuild supersedes every delta: the postings_delta_*
    dirs must be removed, not orphaned forever."""
    import os

    idx = os.path.join(delta_root, vi.INDEX_DIR)
    vi.build_ivf_index(spark, delta_root, k=IVF_K, lloyd_iters=1)
    leftover = [n for n in os.listdir(idx) if n.startswith("postings_delta_")]
    assert leftover == []
    assert "delta_dirs" not in vi.read_index_meta(delta_root)


def test_write_meta_cas_guards(tmp_path):
    """Index maintenance meta publish: lost-update and concurrent-
    maintainer protection (r4 ADVICE — without the CAS, two
    concurrent extends last-writer-win and one delta silently
    disappears from delta_dirs)."""
    import json

    import pytest as _pytest

    from lance_duckdb_spark.sources import lance_format as lf2
    from lance_duckdb_spark.sources import vector_index as vi2

    p = str(tmp_path / "index.json")
    with open(p, "w") as f:
        json.dump({"dataset_version": 3}, f)
    vi2._write_meta_cas(p, {"dataset_version": 4}, 3)  # matching: ok
    with open(p) as f:
        assert json.load(f)["dataset_version"] == 4
    with _pytest.raises(lf2.LanceDatasetError, match="advanced"):
        vi2._write_meta_cas(p, {"dataset_version": 5}, 3)  # stale read
    open(p + ".lock", "w").close()  # a live maintainer holds the lock
    with _pytest.raises(lf2.LanceDatasetError, match="concurrent"):
        vi2._write_meta_cas(p, {"dataset_version": 5}, 4)


def test_crashed_extend_is_invisible_then_retry_replaces(
    spark, sf_dir, tmp_path_factory, monkeypatch
):
    """Mirror of the FTS crash-injection test (r8 VERDICT item 4): a
    crash between the delta-postings write and the meta CAS publish
    must leave search serving the OLD index generation intact (the
    orphan delta is unreferenced), and the RETRY must stage its own
    fresh dir and count the increment exactly ONCE — every vec_id
    appears exactly once across the meta-referenced postings dirs
    (single-assignment argmax), so a double-append would double a
    row's multiplicity and hand one neighbor two ranks."""
    root = str(tmp_path_factory.mktemp("vcrash") / "emb.lance")
    register(spark)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb.where(F.col("vec_id") % 2 == 0).write.format("lance").mode(
        "overwrite"
    ).save(root)
    vi.build_ivf_index(spark, root, k=IVF_K, lloyd_iters=2)
    emb.where(F.col("vec_id") % 2 == 1).write.format("lance").mode(
        "append"
    ).save(root)
    probes = _probes(spark, sf_dir)
    before = sorted(
        map(
            tuple,
            vi.ann_search(
                spark, root, probes, k_neighbors=TOP_K, allow_stale=True
            ).collect(),
        )
    )

    real_cas = vi._write_meta_cas

    def boom(path, meta, expect_version):
        raise RuntimeError("crash before publish")

    monkeypatch.setattr(vi, "_write_meta_cas", boom)
    with pytest.raises(RuntimeError, match="crash before publish"):
        vi.extend_ivf_index(spark, root)
    monkeypatch.setattr(vi, "_write_meta_cas", real_cas)

    # orphan delta staged on disk but referenced by no meta; search
    # still serves the pre-extend generation bit-identically
    idx = os.path.join(root, vi.INDEX_DIR)
    orphans = [n for n in os.listdir(idx) if n.startswith("postings_delta_")]
    assert len(orphans) == 1
    meta0 = vi.read_index_meta(root)
    assert meta0.get("delta_dirs", []) == []
    assert meta0["dataset_version"] == 1  # still pinned at the base
    after_crash = sorted(
        map(
            tuple,
            vi.ann_search(
                spark, root, probes, k_neighbors=TOP_K, allow_stale=True
            ).collect(),
        )
    )
    assert after_crash == before

    # retry publishes its OWN fresh dir; the orphan stays unreferenced
    meta1 = vi.extend_ivf_index(spark, root)
    assert len(meta1["delta_dirs"]) == 1
    assert meta1["delta_dirs"][0] not in orphans
    # exactly-once: every vector appears exactly once across the
    # meta-referenced postings dirs (base + published delta)
    live_dirs = [vi._postings_dir(root, meta1)] + [
        os.path.join(idx, d) for d in meta1["delta_dirs"]
    ]
    from functools import reduce

    posting_ids = reduce(
        lambda a, b: a.unionByName(b),
        [spark.read.parquet(d).select("vec_id") for d in live_dirs],
    )
    dup = (
        posting_ids.groupBy("vec_id")
        .count()
        .where(F.col("count") != 1)
        .count()
    )
    assert dup == 0
    assert posting_ids.count() == emb.count()
