"""Two-level (coarse-quantizer) persisted IVF index
(sources/vector_index.py, r9 VERDICT item 1): past TWO_LEVEL_K_MIN
the index stores sqrt(k) coarse seeds in the meta, the fine
centroids as a cell-partitioned parquet table, and postings
partitioned by CELL (sqrt(k) dirs, not k) — the layout whose driver
state and assignment work stop growing with k. Exercised here with
the bound monkeypatched low so a small corpus takes the two-level
path end to end: build, search, append + extend, staleness."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.sources import vector_index as vi
from lance_duckdb_spark.sources.datasource import register


@pytest.fixture()
def corpus_root(spark, tmp_path, monkeypatch):
    """600 noise vectors + two planted cos-0.95 pairs, written as a
    lance dataset; TWO_LEVEL_K_MIN patched so k=32 builds the
    two-level layout (m = 5 cells)."""
    monkeypatch.setattr(vi, "TWO_LEVEL_K_MIN", 8)
    register(spark)
    rng = np.random.default_rng(3)
    n, dim = 600, 32
    X = rng.standard_normal((n, dim)).astype(np.float32)
    # plant: vec n and n+1 are near-copies of vec 5 and vec 40
    for i, b in enumerate((5, 40)):
        v = X[b].astype(np.float64)
        g = rng.standard_normal(dim)
        g -= (g @ v) / (v @ v) * v
        g *= np.linalg.norm(v) / np.linalg.norm(g)
        th = np.arccos(0.95)
        X = np.vstack([X, (v * np.cos(th) + g * np.sin(th)).astype(np.float32)])
    root = str(tmp_path / "tl.lance")
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(X), dtype=np.int64), "embedding": list(X)}
    )
    spark.createDataFrame(pdf).write.format("lance").mode(
        "overwrite"
    ).save(root)
    return root, X


def test_two_level_build_layout_and_search(spark, corpus_root):
    root, X = corpus_root
    meta = vi.build_ivf_index(spark, root, k=32, lloyd_iters=2)
    assert meta["two_level"] is True
    assert meta["coarse_m"] == 5  # isqrt(32)
    assert "centroids" not in meta  # no inline k x dim matrix
    assert len(meta["coarse_centroids"]) == 5
    # fine table: k rows, cell-partitioned; postings partitioned by
    # cell (m-ish dirs), bucket_id a data column
    idx = os.path.join(root, vi.INDEX_DIR)
    fine = spark.read.parquet(os.path.join(idx, meta["fine_dir"]))
    assert fine.count() == 32
    assert set(fine.columns) == {"bucket_id", "centroid", "cell_id"}
    pdirs = [
        d
        for d in os.listdir(os.path.join(idx, meta["postings_dir"]))
        if d.startswith("cell_id=")
    ]
    assert 1 <= len(pdirs) <= 5
    post = spark.read.parquet(os.path.join(idx, meta["postings_dir"]))
    assert post.count() == len(X)  # every vector posted exactly once
    assert post.select("vec_id").distinct().count() == len(X)

    # search: planted copies must surface at rank 1 for their bases
    probes = spark.createDataFrame(
        pd.DataFrame(
            {
                "probe_id": [5, 40],
                "embedding": [X[5], X[40]],
            }
        )
    )
    got = vi.ann_search(spark, root, probes, k_neighbors=3, nprobe=4).collect()
    top1 = {r.probe_id: r.neighbor_id for r in got if r.rnk == 1}
    assert top1 == {5: 600, 40: 601}
    assert all(r.cos_sim <= 1.0 and r.cos_sim >= -1.0 for r in got)


def test_two_level_extend_and_staleness(spark, corpus_root):
    root, X = corpus_root
    vi.build_ivf_index(spark, root, k=32, lloyd_iters=1)
    # append a near-copy of vec 7; unextended search must refuse
    v = X[7].astype(np.float64)
    rng = np.random.default_rng(9)
    g = rng.standard_normal(len(v))
    g -= (g @ v) / (v @ v) * v
    g *= np.linalg.norm(v) / np.linalg.norm(g)
    th = np.arccos(0.97)
    new = (v * np.cos(th) + g * np.sin(th)).astype(np.float32)
    spark.createDataFrame(
        pd.DataFrame({"vec_id": [10_000], "embedding": [new]})
    ).write.format("lance").mode("append").save(root)
    probes = spark.createDataFrame(
        pd.DataFrame({"probe_id": [7], "embedding": [X[7]]})
    )
    with pytest.raises(vi.StaleIndexError):
        vi.ann_search(spark, root, probes, k_neighbors=2)
    meta = vi.extend_ivf_index(spark, root)
    assert meta["two_level"] is True and len(meta["delta_dirs"]) == 1
    # the delta keeps the cell layout
    ddir = os.path.join(root, vi.INDEX_DIR, meta["delta_dirs"][0])
    assert any(d.startswith("cell_id=") for d in os.listdir(ddir))
    got = vi.ann_search(spark, root, probes, k_neighbors=2).collect()
    assert got and got[0].neighbor_id == 10_000  # appended row found
    # meta on disk never grew a k x dim inline matrix
    with open(vi._index_meta_path(root)) as fh:
        assert "\"centroids\"" not in fh.read()
