"""Persistent IVF vector index over a lance dataset.

Lance proper's signature capability is a vector index stored WITH
the dataset (`_indices/` — IVF partitions + PQ codes; see the
reference's dataset layout, test/test_data.lance) so that ANN search
reads only a few index partitions instead of the corpus. This module
re-expresses that Spark-first:

- ``build_ivf_index``: distributed k-means (deterministic init +
  Lloyd refinement, all element-wise built-in aggregates — no
  explode, map-side partial agg) fits K centroids; every vector is
  assigned to its nearest centroid by an Arrow-batched numpy argmax;
  the postings are written as parquet **hive-partitioned by
  bucket_id** under ``<root>/_indexes/ivf/postings/`` and the tiny
  centroid matrix + metadata goes to ``index.json``.
- ``ann_search``: ranks buckets per probe against the broadcast
  centroids, then scans ONLY the chosen bucket partitions (Spark
  partition pruning on the literal bucket-id set — at 100 TB with
  K=4096 and nprobe=64 the scan touches 1.6% of the index) and
  exact-reranks with the bit-exact sequential-fold cosine.

Staleness contract: the index records the dataset version it was
built from; searching after the dataset advanced raises (rebuild or
search the indexed version explicitly) — an index must never
silently return results over missing rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import lance_format as lf
from .datasource import register

INDEX_DIR = "_indexes/ivf"


class StaleIndexError(lf.LanceDatasetError):
    pass


def _index_meta_path(root: str) -> str:
    return os.path.join(root, INDEX_DIR, "index.json")


def _postings_dir(root: str) -> str:
    return os.path.join(root, INDEX_DIR, "postings")


def _assign_buckets(df: DataFrame, bc_centroids, column: str, id_col: str):
    """Arrow-batched nearest-centroid assignment (cosine argmax).
    Ties broken toward the lower bucket id (numpy argmax order)."""
    import numpy as np
    import pandas as pd

    def assign(batches):
        C = bc_centroids.value  # (k, dim) float64
        c_nrm = np.sqrt((C * C).sum(axis=1))
        c_nrm[c_nrm == 0] = 1.0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[column]), dtype=np.float32).astype(
                np.float64
            )
            x_nrm = np.sqrt((X * X).sum(axis=1))
            x_nrm[x_nrm == 0] = 1.0
            sim = (X / x_nrm[:, None]) @ (C / c_nrm[:, None]).T
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bucket_id": np.argmax(sim, axis=1).astype(np.int32),
                    column: pdf[column],
                }
            )

    out_schema = (
        f"{id_col} long, bucket_id int, {column} array<float>"
    )
    return df.mapInPandas(assign, schema=out_schema)


def _bucket_means(assigned: DataFrame, C, column: str, dim: int):
    """Per-bucket mean vectors, dim-adaptive.

    dim <= 256: ``dim`` element-wise ``avg`` aggregates — map-side
    partial agg, one narrow shuffle of k×dim doubles, all codegen.

    dim > 256 (production embedding sizes): a wide agg list would
    strain codegen, so aggregate in two Arrow stages instead —
    per-partition numpy partial sums (mapInPandas: ≤ k rows out per
    partition), then one shuffle of those partials (partitions×k
    rows, NOT the corpus) combined per bucket. Only k×dim doubles
    ever reach the driver either way."""
    import numpy as np
    from pyspark.sql import functions as F

    k = C.shape[0]
    if dim <= 256:
        means = (
            assigned.groupBy("bucket_id")
            .agg(
                *[
                    F.avg(F.element_at(F.col(column), i + 1)).alias(f"m{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        C = C.copy()  # empty buckets keep their previous centroid
        for r in means:
            C[r["bucket_id"]] = [r[f"m{i}"] for i in range(dim)]
        return C

    import pandas as pd

    def partial_sums(batches):
        sums: dict[int, "np.ndarray"] = {}
        counts: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[column]]
            )
            b = pdf["bucket_id"].to_numpy()
            for bid in np.unique(b):
                m = b == bid
                sums[int(bid)] = sums.get(int(bid), 0) + X[m].sum(axis=0)
                counts[int(bid)] = counts.get(int(bid), 0) + int(m.sum())
        if sums:
            yield pd.DataFrame(
                {
                    "bucket_id": list(sums),
                    "psum": [sums[i].tolist() for i in sums],
                    "cnt": [counts[i] for i in sums],
                }
            )

    partials = assigned.mapInPandas(
        partial_sums, schema="bucket_id int, psum array<double>, cnt long"
    )

    def combine(key, pdf):
        S = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["psum"]]
        ).sum(axis=0)
        n = int(pdf["cnt"].sum())
        return pd.DataFrame(
            {"bucket_id": [key[0]], "mean": [(S / max(n, 1)).tolist()]}
        )

    rows = (
        partials.groupBy("bucket_id")
        .applyInPandas(combine, schema="bucket_id int, mean array<double>")
        .collect()
    )
    C = C.copy()
    for r in rows:
        C[r["bucket_id"]] = r["mean"]
    return C


def build_ivf_index(
    spark: SparkSession,
    root: str,
    column: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    lloyd_iters: int = 2,
) -> dict:
    """Fit + persist an IVF index for ``root``'s ``column``.

    Centroid fit is fully distributed: init = the k lowest-id
    vectors (deterministic), then ``lloyd_iters`` rounds of
    assign→mean. The per-bucket mean uses 'dim' element-wise
    ``avg`` aggregates over the array column — partial aggregation
    map-side, one narrow shuffle of k×dim doubles per round, no
    explode of the corpus. Only the k×dim centroid matrix ever
    reaches the driver."""
    import numpy as np

    register(spark)
    manifest = lf.read_manifest(root)
    df = spark.read.format("lance").load(root).select(id_col, column)
    first = df.select(F.size(F.col(column)).alias("d")).first()
    if first is None:
        raise lf.LanceDatasetError(f"cannot index empty dataset {root}")
    dim = first["d"]

    # deterministic init: the k lowest-id vectors. orderBy + limit
    # compiles to TakeOrderedAndProject — a distributed per-partition
    # top-k then a k-row driver merge — NOT a global sort through one
    # task (the r3 Window.orderBy version pulled the whole corpus
    # through a single partition; driver-bottleneck class of bug at
    # 100 TB).
    init = df.orderBy(id_col).limit(k).select(column).collect()
    C = np.array([r[0] for r in init], dtype=np.float64)

    for _ in range(max(0, lloyd_iters)):
        bc = spark.sparkContext.broadcast(C)
        assigned = _assign_buckets(df, bc, column, id_col)
        C = _bucket_means(assigned, C, column, dim)

    bc = spark.sparkContext.broadcast(C)
    postings = _assign_buckets(df, bc, column, id_col)
    pdir = _postings_dir(root)
    (
        postings.repartition("bucket_id")
        .write.mode("overwrite")
        .partitionBy("bucket_id")
        .parquet(pdir)
    )
    meta = {
        "column": column,
        "id_col": id_col,
        "k": k,
        "dim": dim,
        "dataset_version": manifest.version,
        "centroids": C.tolist(),
    }
    os.makedirs(os.path.join(root, INDEX_DIR), exist_ok=True)
    tmp = _index_meta_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _index_meta_path(root))
    return meta


def read_index_meta(root: str) -> dict:
    p = _index_meta_path(root)
    if not os.path.exists(p):
        raise lf.LanceDatasetError(
            f"no IVF index at {root}; run build_ivf_index first"
        )
    with open(p) as f:
        return json.load(f)


def ann_search(
    spark: SparkSession,
    root: str,
    probes: DataFrame,
    k_neighbors: int = 10,
    nprobe: int = 4,
    allow_stale: bool = False,
) -> DataFrame:
    """ANN top-k via the persisted index.

    ``probes``: DataFrame with (probe_id, <column>) — a small query
    set (broadcast). Bucket choice per probe runs driver-side over
    the collected probe vectors (the probe set is the only thing
    ever collected, same discipline as ann_topk_bruteforce); the
    postings scan is filtered by LITERAL bucket ids, so Spark's
    partition pruning skips every other bucket directory before IO.
    Exact cosine rerank inside the candidate buckets."""
    import numpy as np

    from ..operators.similarity import cosine

    meta = read_index_meta(root)
    head = lf.read_manifest(root).version
    if head != meta["dataset_version"] and not allow_stale:
        raise StaleIndexError(
            f"IVF index was built at dataset version "
            f"{meta['dataset_version']} but the dataset is at {head}; "
            "rebuild the index (or pass allow_stale=True to search "
            "the indexed snapshot)"
        )
    column, id_col = meta["column"], meta["id_col"]
    C = np.array(meta["centroids"], dtype=np.float64)
    c_nrm = np.sqrt((C * C).sum(axis=1))
    c_nrm[c_nrm == 0] = 1.0

    probe_rows = probes.collect()  # small query set by contract
    pb_rows = []
    all_buckets: set[int] = set()
    for r in probe_rows:
        x = np.asarray(r[column], dtype=np.float64)
        xn = np.sqrt((x * x).sum()) or 1.0
        sim = (C / c_nrm[:, None]) @ (x / xn)
        order = np.argsort(-sim, kind="stable")[:nprobe]
        for b in order:
            pb_rows.append((int(r["probe_id"]), int(b)))
            all_buckets.add(int(b))
    probe_buckets = spark.createDataFrame(
        pb_rows, schema="probe_id long, bucket_id int"
    ).join(
        probes.select(
            F.col("probe_id"), F.col(column).alias("__probe_vec")
        ),
        "probe_id",
    )

    post = spark.read.parquet(_postings_dir(root)).where(
        F.col("bucket_id").isin(sorted(all_buckets))
    )
    cands = post.join(F.broadcast(probe_buckets), "bucket_id").where(
        F.col(id_col) != F.col("probe_id")
    )
    from pyspark.sql import Window

    dim = meta["dim"]
    scored = cands.select(
        "probe_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("__probe_vec"), F.col(column), dim).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k_neighbors)
        .select("probe_id", "neighbor_id", "cos_sim", "rnk")
        .orderBy("probe_id", "rnk")
    )
