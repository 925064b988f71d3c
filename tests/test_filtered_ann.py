"""Filtered ANN search (r13, r12 VERDICT item 1): predicate + vector
in one indexed query with PRE-filter semantics — the production
vector-search call shape (Lance proper's nearest+filter scan,
rust/scanner.rs; rust/lib.rs:148-236). Covered here:

- pre-filter semantics: every result satisfies the predicate AND the
  result set is the best k QUALIFYING rows (a post-filter of the
  unfiltered top-k provably under-returns on this corpus);
- delta-extend: appended qualifying rows are found, appended
  NON-qualifying rows are excluded, through the same filter;
- staleness: a filtered search after the dataset advanced raises;
- the IVF_PQ and SQ8 spellings of the same predicate;
- SQ8 + filter stays EXACT (bit-identical to filtered brute force —
  the lossless bound is unaffected by which rows are scanned).
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.operators.quantize import (
    build_sq8_store,
    sq8_store_search,
)
from lance_duckdb_spark.operators.similarity import (
    ANN_FILTER_PRED,
    FILTERED_NPROBE,
    N_PROBES,
    TOP_K,
    IVF_K,
    _ann_topk_filtered_exact,
    ann_ivf_filtered,
)
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.sources.vector_index import (
    StaleIndexError,
    ann_search,
    ann_search_pq,
    build_ivf_index,
    build_ivf_pq_index,
    extend_ivf_index,
)
from lance_duckdb_spark.tables import load


@pytest.fixture()
def labeled_root(spark, sf_dir):
    root = f"/tmp/lance_duckdb_spark/test_filtered_{uuid.uuid4().hex[:8]}.lance"
    register(spark)
    emb = load(spark, sf_dir, "embeddings")
    emb.select("vec_id", "embedding", "label").write.format("lance").mode(
        "overwrite"
    ).save(root)
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _labels(spark, sf_dir) -> dict:
    emb = load(spark, sf_dir, "embeddings")
    return {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}


def _probes(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )


def test_filtered_search_prefilter_semantics(spark, sf_dir, labeled_root):
    build_ivf_index(spark, labeled_root, k=IVF_K, lloyd_iters=2)
    probes = _probes(spark, sf_dir)
    got = ann_search(
        spark,
        labeled_root,
        probes,
        k_neighbors=TOP_K,
        nprobe=FILTERED_NPROBE,
        filter=ANN_FILTER_PRED,
    ).collect()
    labels = _labels(spark, sf_dir)
    # every result satisfies the predicate
    assert all(labels[r["neighbor_id"]] in (2, 5) for r in got)
    # full k per probe — pre-filter does not under-return
    per_probe = {}
    for r in got:
        per_probe.setdefault(r["probe_id"], []).append(r["neighbor_id"])
    assert all(len(v) == TOP_K for v in per_probe.values())
    assert len(per_probe) == N_PROBES
    # recall vs the exact filtered ground truth
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in _ann_topk_filtered_exact(spark, sf_dir).collect()
    }
    approx = {(r["probe_id"], r["neighbor_id"]) for r in got}
    assert len(approx & exact) / len(exact) >= 0.85
    # and post-filtering the UNFILTERED top-k under-returns (the
    # reason pre-filter semantics exist): of 10 unfiltered results
    # only the ~20% qualifying survive
    unfiltered = ann_search(
        spark, labeled_root, probes, k_neighbors=TOP_K, nprobe=FILTERED_NPROBE
    ).collect()
    post = [r for r in unfiltered if labels[r["neighbor_id"]] in (2, 5)]
    assert len(post) < len(got)


def test_filtered_search_delta_extend_and_staleness(
    spark, sf_dir, labeled_root
):
    build_ivf_index(spark, labeled_root, k=IVF_K, lloyd_iters=2)
    emb = load(spark, sf_dir, "embeddings")
    p0 = emb.where(F.col("vec_id") == 0).select("embedding").first()
    vec = list(p0["embedding"])
    # append an exact copy of probe 0's vector twice: one QUALIFYING
    # (label 2) and one NON-qualifying (label 7)
    appended = spark.createDataFrame(
        [(900001, vec, 2), (900002, vec, 7)],
        "vec_id long, embedding array<float>, label int",
    )
    appended.write.format("lance").mode("append").save(labeled_root)
    probes = _probes(spark, sf_dir)
    # staleness guard applies to filtered searches identically
    with pytest.raises(StaleIndexError):
        ann_search(
            spark, labeled_root, probes, filter=ANN_FILTER_PRED
        ).collect()
    extend_ivf_index(spark, labeled_root)
    got = ann_search(
        spark,
        labeled_root,
        probes,
        k_neighbors=TOP_K,
        nprobe=FILTERED_NPROBE,
        filter=ANN_FILTER_PRED,
    ).collect()
    by_probe0 = [r for r in got if r["probe_id"] == 0]
    ids0 = [r["neighbor_id"] for r in by_probe0]
    # the appended qualifying duplicate is probe 0's top neighbor
    assert ids0[0] == 900001
    assert by_probe0[0]["cos_sim"] == pytest.approx(1.0)
    # the non-qualifying duplicate is filtered out everywhere
    assert all(r["neighbor_id"] != 900002 for r in got)


def test_filtered_search_pq(spark, sf_dir, labeled_root):
    build_ivf_pq_index(spark, labeled_root, k=IVF_K, lloyd_iters=2)
    probes = _probes(spark, sf_dir)
    got = ann_search_pq(
        spark,
        labeled_root,
        probes,
        k_neighbors=TOP_K,
        nprobe=FILTERED_NPROBE,
        refine=4,
        filter=ANN_FILTER_PRED,
    ).collect()
    labels = _labels(spark, sf_dir)
    assert all(labels[r["neighbor_id"]] in (2, 5) for r in got)
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in _ann_topk_filtered_exact(spark, sf_dir).collect()
    }
    approx = {(r["probe_id"], r["neighbor_id"]) for r in got}
    assert len(approx & exact) / len(exact) >= 0.7  # PQ tier bound


def test_filtered_sq8_is_exact(spark, sf_dir):
    """SQ8 + filter: the lossless bound doesn't care which rows are
    scanned, so the filtered store search is BIT-IDENTICAL to the
    filtered brute force."""
    emb = load(spark, sf_dir, "embeddings")
    store_dir = f"/tmp/lance_duckdb_spark/test_sq8f_{uuid.uuid4().hex[:8]}"
    try:
        build_sq8_store(spark, emb, store_dir)
        got = sq8_store_search(
            spark, emb, store_dir, filter=ANN_FILTER_PRED
        ).collect()
        exact = (
            _ann_topk_filtered_exact(spark, sf_dir)
            .orderBy("probe_id", "rnk")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in exact]
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)


def test_ann_ivf_filtered_driver_query(spark, sf_dir):
    out = ann_ivf_filtered(spark, sf_dir).collect()
    # the hashed artifact: exact filtered top-k rows + a TRUE flag
    assert all(r["filtered_recall_ok"] for r in out)
    assert len(out) == N_PROBES * TOP_K
    labels = _labels(spark, sf_dir)
    assert all(labels[r["neighbor_id"]] in (2, 5) for r in out)


def test_filter_ids_scan_is_column_pruned(spark, sf_dir, labeled_root):
    """The qualifying-id scan must not decode the embedding column:
    the datasource's explicit ``columns`` projection narrows the
    ReadSchema to id + predicate columns (Spark can't push its own
    pruning into a Python data source)."""
    from lance_duckdb_spark.sources.vector_index import (
        _filter_ids,
        build_ivf_index,
        read_index_meta,
    )

    build_ivf_index(spark, labeled_root, k=IVF_K, lloyd_iters=1)
    meta = read_index_meta(spark and labeled_root)
    df = _filter_ids(spark, labeled_root, meta, ANN_FILTER_PRED)
    qe = df._jdf.queryExecution()
    assert "embedding" not in qe.executedPlan().toString()
    # the formatted form carries ReadSchema + PushedFilters
    formatted = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "ReadSchema: struct<vec_id:bigint,label:int>" in formatted
    assert "PushedFilters: [In(label, [2,5])]" in formatted


def test_filtered_search_two_level(spark, sf_dir, tmp_path, monkeypatch):
    """The filter predicate composes with the TWO-LEVEL index layout
    identically: the qualifying semi-join applies after the
    cell-pruned postings read, so every result qualifies and the
    top-k is over qualifying rows only."""
    import numpy as np
    import pandas as pd

    from lance_duckdb_spark.sources import vector_index as vi

    monkeypatch.setattr(vi, "TWO_LEVEL_K_MIN", 8)
    register(spark)
    rng = np.random.default_rng(7)
    n, dim = 400, 16
    X = rng.standard_normal((n, dim)).astype(np.float32)
    labels = (np.arange(n) % 10).astype(np.int32)
    root = str(tmp_path / "tlf.lance")
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(X),
            "label": labels,
        }
    )
    spark.createDataFrame(pdf).write.format("lance").mode(
        "overwrite"
    ).save(root)
    meta = vi.build_ivf_index(spark, root, k=32, lloyd_iters=1)
    assert meta.get("two_level")
    probes = spark.createDataFrame(
        pd.DataFrame(
            {"probe_id": np.arange(3, dtype=np.int64), "embedding": list(X[:3])}
        )
    )
    got = vi.ann_search(
        spark, root, probes, k_neighbors=5, nprobe=16,
        filter=ANN_FILTER_PRED,
    ).collect()
    assert len(got) == 15  # 3 probes x full k
    assert all(labels[r["neighbor_id"]] in (2, 5) for r in got)


def test_stream_read_over_renamed_dataset(spark, sf_dir, tmp_path):
    """A streaming read of a renamed dataset resolves by field id
    too (the stream partitions carry the same colmap as batch):
    values stream under the NEW name, never null-filled."""
    from pyspark.sql.types import Row

    from lance_duckdb_spark.catalog import lance_sql

    register(spark)
    root = str(tmp_path / "stream_rn.lance")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k int, val string"
    ).write.format("lance").mode("overwrite").save(root)
    lance_sql(
        spark, f"ALTER TABLE '{root}' RENAME COLUMN val TO payload"
    ).collect()
    stream = spark.readStream.format("lance").load(root)
    q = (
        stream.writeStream.format("memory")
        .queryName("renamed_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_rn"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from renamed_stream").collect()
    assert len(rows) == 20
    assert {r["payload"] for r in rows} == {f"v{i}" for i in range(20)}


def test_filtered_search_keeps_bucket_pruning(spark, sf_dir, labeled_root):
    """The pre-filter semi-join must not cost the index its bucket
    partition pruning: the postings scan still carries a bucket_id
    PartitionFilter, and the qualifying-id side joins as LeftSemi."""
    build_ivf_index(spark, labeled_root, k=IVF_K, lloyd_iters=1)
    df = ann_search(
        spark,
        labeled_root,
        _probes(spark, sf_dir).limit(1),
        k_neighbors=5,
        nprobe=2,
        filter=ANN_FILTER_PRED,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "bucket_id" in seg
    assert "LeftSemi" in plan


def test_filtered_search_allow_stale_is_snapshot_consistent(
    spark, sf_dir, labeled_root
):
    """filter + allow_stale: the qualifying-id set is evaluated on
    the dataset PINNED at the indexed version, so rows appended
    after the build are invisible to the filtered search even when
    they satisfy the predicate — the same snapshot the unfiltered
    stale search serves."""
    build_ivf_index(spark, labeled_root, k=IVF_K, lloyd_iters=2)
    emb = load(spark, sf_dir, "embeddings")
    vec = list(
        emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    )
    spark.createDataFrame(
        [(900010, vec, 2)], "vec_id long, embedding array<float>, label int"
    ).write.format("lance").mode("append").save(labeled_root)
    got = ann_search(
        spark,
        labeled_root,
        _probes(spark, sf_dir),
        k_neighbors=TOP_K,
        nprobe=FILTERED_NPROBE,
        filter=ANN_FILTER_PRED,
        allow_stale=True,
    ).collect()
    assert all(r["neighbor_id"] != 900010 for r in got)
