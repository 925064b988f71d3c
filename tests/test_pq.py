"""IVF_PQ index: recall vs brute force, code compression, bucket
pruning, staleness guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.operators.similarity import (
    IVF_K,
    N_PROBES,
    TOP_K,
    ann_topk_bruteforce,
)
from lance_duckdb_spark.sources import vector_index as vi
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.tables import load


@pytest.fixture(scope="module")
def pq_root(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pq") / "emb.lance")
    register(spark)
    emb = load(spark, sf_dir, "embeddings")
    emb.select("vec_id", "embedding").write.format("lance").mode(
        "overwrite"
    ).save(root)
    vi.build_ivf_pq_index(spark, root, k=IVF_K, lloyd_iters=2)
    return root


def _probes(spark, sf_dir):
    return (
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < N_PROBES)
        .select(F.col("vec_id").alias("probe_id"), "embedding")
    )


def test_pq_recall_vs_bruteforce(spark, sf_dir, pq_root):
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in ann_topk_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r.probe_id, r.neighbor_id)
        for r in vi.ann_search_pq(
            spark, pq_root, _probes(spark, sf_dir),
            k_neighbors=TOP_K, nprobe=6, refine=4,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"PQ recall {recall}"


def test_pq_postings_store_codes_not_vectors(spark, pq_root):
    post = spark.read.parquet(vi._pq_postings_dir(pq_root))
    assert set(post.columns) == {"vec_id", "codes", "bucket_id"}
    meta = vi.read_pq_index_meta(pq_root)
    lens = post.select(F.length("codes").alias("L")).distinct().collect()
    assert [r.L for r in lens] == [meta["m_sub"]]  # 8 bytes per vector


def test_pq_search_prunes_buckets(spark, sf_dir, pq_root):
    df = vi.ann_search_pq(
        spark, pq_root, _probes(spark, sf_dir).limit(1), nprobe=2
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "bucket_id" in seg


def test_pq_staleness_guard(spark, sf_dir, pq_root):
    emb = load(spark, sf_dir, "embeddings").limit(3)
    emb.select("vec_id", "embedding").write.format("lance").mode(
        "append"
    ).save(pq_root)
    with pytest.raises(vi.StaleIndexError):
        vi.ann_search_pq(spark, pq_root, _probes(spark, sf_dir))
    # allow_stale searches the indexed snapshot
    vi.ann_search_pq(
        spark, pq_root, _probes(spark, sf_dir), allow_stale=True
    ).count()


def test_pq_index_delta_appends_without_rebuild(spark, sf_dir, tmp_path):
    """extend_ivf_pq_index: appended vectors become searchable via a
    delta postings dir; base codes untouched; a dv delete no longer
    refuses the next extend (r14) — it re-pins with serve_live_mask
    and the search masks the deleted ids."""
    import pyarrow.compute as pc

    root = str(tmp_path / "pqd.lance")
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb.where(F.col("vec_id") % 2 == 0).write.format("lance").mode(
        "overwrite"
    ).save(root)
    vi.build_ivf_pq_index(spark, root, k=IVF_K, lloyd_iters=1)
    emb.where(F.col("vec_id") % 2 == 1).write.format("lance").mode(
        "append"
    ).save(root)
    meta = vi.extend_ivf_pq_index(spark, root)
    assert len(meta["delta_dirs"]) == 1
    got = vi.ann_search_pq(
        spark, root, _probes(spark, sf_dir), k_neighbors=TOP_K,
        nprobe=8, refine=4,
    ).collect()
    found = {r.neighbor_id for r in got}
    assert any(n % 2 == 1 for n in found)  # appended vectors searchable
    # second extend at head is a no-op
    assert vi.extend_ivf_pq_index(spark, root) == meta
    # deletion-vector delete: the next extend tolerates it (r14 —
    # pure-DELETE re-pin with the live-mask flag) and the search
    # keeps the deleted ids out even at head == pin
    from lance_duckdb_spark.sources import lance_format as lf

    lf.delete_where(root, pc.field("vec_id") < 3, use_deletion_vectors=True)
    meta3 = vi.extend_ivf_pq_index(spark, root)
    assert meta3["serve_live_mask"] is True
    got3 = vi.ann_search_pq(
        spark, root, _probes(spark, sf_dir), k_neighbors=TOP_K,
        nprobe=8, refine=4, exclude_self=False,
    ).collect()
    assert got3
    assert all(r.neighbor_id >= 3 for r in got3)
