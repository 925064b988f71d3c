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


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
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
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        )
        # truncate lineage each iteration: without this, iteration i
        # replays all previous join rounds (O(iters^2) recompute).
        # Parquet spill, not localCheckpoint: an executor-storage
        # block lost mid-loop is unrecoverable and fails the whole
        # propagation; the spilled label frame (one row per
        # clustered doc) re-reads from durable storage instead.
        new_labels = spill_to_parquet(new_labels, "lp_labels")
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # the previous iteration's spill is dead once `changed` has
        # executed — reclaim it so the loop holds ≤2 spill dirs, not
        # MAX_ITERS (no-op on iteration 1, whose frame is not a
        # spill). Only the FINAL labels spill outlives the loop: it
        # backs the returned aggregation.
        release_spill(labels)
        labels = new_labels
        if changed == 0:
            converged = True
            break
    # release the pinned edge blocks: the driver session is long-lived
    # and runs 100+ queries — leaked caches accumulate in executor
    # storage and evict useful blocks (r5 review finding). The final
    # labels checkpoint is tiny (one row per clustered doc) and is
    # consumed by the aggregation below before going out of scope.
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"label propagation did not converge in {MAX_ITERS} iterations "
            "(cluster diameter exceeds the cap); raise MAX_ITERS"
        )
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


QUERIES = {"dedup_clusters": dedup_clusters}
ORACLE = {"dedup_clusters": DEDUP_CLUSTERS_SQL}
