"""Duplicate-cluster resolution via connected components
(SURVEY.md §2.C19): pairwise near-dup evidence (MinHash-LSH pairs)
→ transitive clusters with a canonical id (min doc_id reachable).

Spark side: min-label propagation — the Pregel-lite loop (labels
join edges, take the min neighbor label, repeat until fixpoint).
Each iteration is one shuffle on the node id; convergence needs
O(diameter) iterations, and near-dup cluster diameters are tiny.
This is the canonical iterative-algorithm shape Catalyst cannot
express in one query — the driver loop controls iteration, every
step stays declarative and distributed.

Oracle side: the SAME min-label propagation, unrolled into
MAX_ITERS materialized CTE stages (each stage one O(E) hop — the
exact loop body the Spark side runs). The original recursive-CTE
transitive closure (reach sets) was O(k³) per iteration on a
k-clique and timed out at sf1 (SF1_VALIDATION r5); the unrolled
form is bounded at MAX_ITERS·O(E) and reaches the same fixpoint
whenever the Spark side converges (which it asserts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..materialize import release_spill, spill_to_parquet
from .dedup import DEDUP_MINHASH_SQL, dedup_minhash_lsh

MAX_ITERS = 20


def _propagate_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The converged (node, label) frame — min doc_id reachable over
    the near-dup edge set. Called by dedup_clusters (cluster census)
    and cluster_canonical (keep-best resolution) — each CALL runs its
    own propagation (the driver's hermetic-query contract; there is
    no cross-query result sharing). WITHIN a call the returned frame
    is parquet-spilled, so its consumers re-read durable storage
    instead of replaying the join loop."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).distinct()
    labels = edges.select(F.col("doc_a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    edges = edges.cache()
    converged = False
    try:
        for _ in range(MAX_ITERS):
            neighbor_min = (
                edges.join(labels, edges.doc_b == labels.node)
                .groupBy(F.col("doc_a").alias("n2"))
                .agg(F.min("label").alias("nbr_label"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.node == F.col("n2"), "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"),
                        F.coalesce("nbr_label", F.col("label")),
                    ).alias("label"),
                )
            )
            # truncate lineage each iteration: without this,
            # iteration i replays all previous join rounds
            # (O(iters^2) recompute). Parquet spill, not
            # localCheckpoint: an executor-storage block lost
            # mid-loop is unrecoverable and fails the whole
            # propagation; the spilled label frame (one row per
            # clustered doc) re-reads from durable storage instead.
            new_labels = spill_to_parquet(new_labels, "lp_labels")
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.label") != F.col("o.label"))
                .count()
            )
            # the previous iteration's spill is dead once `changed`
            # has executed — reclaim it so the loop holds ≤2 spill
            # dirs, not MAX_ITERS (no-op on iteration 1, whose frame
            # is not a spill). Only the FINAL labels spill outlives
            # the loop: it backs the returned aggregation.
            release_spill(labels)
            labels = new_labels
            if changed == 0:
                converged = True
                break
    finally:
        # release the pinned edge blocks EVEN ON FAILURE: the driver
        # session is long-lived and runs 100+ queries — a leaked
        # cache accumulates in executor storage and evicts useful
        # blocks (r5 review finding; r8: moved into finally so a
        # mid-loop exception can't leak it). The final labels spill
        # is tiny (one row per clustered doc) and is consumed by the
        # caller's aggregation before going out of scope.
        edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"label propagation did not converge in {MAX_ITERS} iterations "
            "(cluster diameter exceeds the cap); raise MAX_ITERS"
        )
    return labels


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = _propagate_labels(spark, sf_dir)
    return (
        labels.groupBy(F.col("label").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max("node").alias("max_member"),
        )
        .orderBy("cluster_id")
    )


_PAIRS_SQL = DEDUP_MINHASH_SQL.replace("ORDER BY doc_a, doc_b", "")

# One unrolled propagation hop == one iteration of the Spark loop:
# label_{i}(n) = min(label_{i-1}(n), min over neighbors label_{i-1}).
# AS MATERIALIZED is load-bearing: lab{i-1} is referenced twice per
# stage, and an inlining planner would re-evaluate the whole prefix
# exponentially without it.
_LP_STAGES = "\n".join(
    f"""lab{i} AS MATERIALIZED (
  SELECT l.node,
         LEAST(l.label, COALESCE(MIN(nl.label), l.label)) AS label
  FROM lab{i - 1} l
  LEFT JOIN edges e ON e.a = l.node
  LEFT JOIN lab{i - 1} nl ON nl.node = e.b
  GROUP BY l.node, l.label
),"""
    for i in range(1, MAX_ITERS + 1)
)

DEDUP_CLUSTERS_SQL = f"""
WITH minhash_pairs AS MATERIALIZED (
{_PAIRS_SQL}
),
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM minhash_pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM minhash_pairs
),
lab0 AS MATERIALIZED (
  SELECT DISTINCT a AS node, a AS label FROM edges
),
{_LP_STAGES}
final_labels AS (
  SELECT node, label FROM lab{MAX_ITERS}
)
SELECT label AS cluster_id, COUNT(*) AS n_members,
       MAX(node) AS max_member
FROM final_labels
GROUP BY label
ORDER BY cluster_id
"""


def cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C48: the RESOLUTION step a dedup pipeline actually ships —
    for every near-dup cluster, keep the best-quality member (the
    doc the pipeline retains; everything else in the cluster is the
    drop set). Canonical = highest quality_score, tie-broken by
    lowest doc_id; NULL quality (NULL text) sorts last in BOTH
    engines via explicit NULLS LAST (Spark's DESC default is
    nulls-last, DuckDB's is nulls-first — left implicit this
    diverges on planted-NULL corpora).

    Scale shape: the label propagation is the proven dedup_clusters
    loop (one spilled O(members) frame), quality is one corpus scan
    (Arrow-batched counts), the join keys on doc_id, and the
    per-cluster argmax is a window over cluster-partitioned slim
    rows — no step holds a cluster's texts in one task."""
    from pyspark.sql import Window

    from .text import quality_score

    labels = _propagate_labels(spark, sf_dir)
    quality = quality_score(spark, sf_dir).select("doc_id", "quality")
    ranked = (
        labels.join(quality, labels.node == quality.doc_id)
        .select(
            F.col("label").alias("cluster_id"),
            "doc_id",
            "quality",
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.desc_nulls_last("quality"), F.asc("doc_id")
                )
            ),
        )
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
    )
    return (
        ranked.where(F.col("rnk") == 1)
        .select(
            "cluster_id",
            "n_members",
            F.col("doc_id").alias("canonical_doc"),
            F.col("quality").alias("canonical_quality"),
        )
        .orderBy("cluster_id")
    )


def _canonical_sql() -> str:
    from .text import QUALITY_SCORE_SQL

    # reuse the cluster CTE chain up to final_labels, swap the census
    # SELECT for the per-cluster argmax over the quality scores
    idx = DEDUP_CLUSTERS_SQL.rindex("SELECT label AS cluster_id")
    prefix = DEDUP_CLUSTERS_SQL[:idx].rstrip()
    assert prefix.endswith(")"), prefix[-80:]
    return f"""{prefix},
quality AS MATERIALIZED (
  SELECT doc_id, quality FROM ({QUALITY_SCORE_SQL})
),
ranked AS (
  SELECT l.label AS cluster_id, q.doc_id, q.quality,
    ROW_NUMBER() OVER (PARTITION BY l.label
      ORDER BY q.quality DESC NULLS LAST, q.doc_id ASC) AS rnk,
    COUNT(*) OVER (PARTITION BY l.label) AS n_members
  FROM final_labels l JOIN quality q ON q.doc_id = l.node
)
SELECT cluster_id, n_members, doc_id AS canonical_doc,
       quality AS canonical_quality
FROM ranked WHERE rnk = 1
ORDER BY cluster_id
"""


CLUSTER_CANONICAL_SQL = _canonical_sql()


QUERIES = {
    "dedup_clusters": dedup_clusters,
    "cluster_canonical": cluster_canonical,
}
ORACLE = {
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
    "cluster_canonical": CLUSTER_CANONICAL_SQL,
}
