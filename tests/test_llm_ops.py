"""Quality assertions for the approximate LLM-pipeline operators.

The DuckDB oracles check the *algorithms* deterministically; these
tests check the algorithms are *good*: LSH recall against exact
similarity, and IVF recall against brute force.
"""

from __future__ import annotations

from lance_duckdb_spark.operators import dedup, similarity

from .oracle import duckdb_connection


def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    con = duckdb_connection(sf_dir)
    exact = con.execute(
        """
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(string_split(trim(text), ' ')) - 1),
            i -> string_split(trim(text), ' ')[i] || ' ' ||
                 string_split(trim(text), ' ')[i+1] || ' ' ||
                 string_split(trim(text), ' ')[i+2]))) AS shingle
          FROM documents),
        sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id da, b.doc_id db, COUNT(*) ni
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT da, db FROM inter
        JOIN sizes za ON za.doc_id = da JOIN sizes zb ON zb.doc_id = db
        WHERE CAST(ni AS DOUBLE) / (za.sz + zb.sz - ni) >= 0.5
        """
    ).fetchall()
    con.close()
    exact_pairs = {(a, b) for a, b in exact}
    assert exact_pairs, "corpus has no strong near-dup pairs; weak test"
    got = dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    got_pairs = {(r.doc_a, r.doc_b) for r in got}
    recall = len(exact_pairs & got_pairs) / len(exact_pairs)
    # LSH with 8 bands x 4 rows: P(catch) at jac 0.5 is ~0.4 per
    # pair but the planted near-dups sit far above threshold
    assert recall >= 0.9, f"minhash recall {recall} on {len(exact_pairs)} pairs"


def test_ann_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = similarity.ann_topk_bruteforce(spark, sf_dir).collect()
    approx = similarity.ann_ivf(spark, sf_dir).collect()
    exact_set = {(r.probe_id, r.neighbor_id) for r in exact}
    approx_set = {(r.probe_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.9, f"ann_ivf recall {recall}"


def test_simhash_pairs_are_near_dups(spark, sf_dir):
    pairs = dedup.dedup_simhash(spark, sf_dir).collect()
    for r in pairs:
        assert r.hamming <= dedup.HAMMING_T


def test_embedding_lsh_recall_vs_exact(spark, sf_dir):
    exact = {
        (r.vec_a, r.vec_b)
        for r in similarity.embedding_neardup(spark, sf_dir).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in similarity.embedding_neardup_lsh(spark, sf_dir).collect()
    }
    assert exact, "no exact near-dup pairs; weak test"
    # LSH must be a subset (same verification threshold) with
    # reasonable recall on the cos>=0.4 pairs
    assert lsh <= exact
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.65, f"embedding LSH recall {recall}"


def test_ann_ivf_indexed_recall_and_pruning(spark, sf_dir):
    """Persistent-index ANN: recall vs brute force, partition
    pruning of the postings scan, and the staleness guard."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from lance_duckdb_spark.sources import vector_index as vi

    exact = similarity.ann_topk_bruteforce(spark, sf_dir).collect()
    approx = similarity.ann_ivf_indexed(spark, sf_dir).collect()
    exact_set = {(r.probe_id, r.neighbor_id) for r in exact}
    approx_set = {(r.probe_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.9, f"ann_ivf_indexed recall {recall}"

    tag = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join("/tmp/lance_duckdb_spark", tag, "ivfindex.lance")

    # the postings scan is partition-pruned to the probed buckets
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    res = vi.ann_search(spark, root, probes, k_neighbors=5, nprobe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "bucket_id" in plan  # partition filter present on the scan

    # staleness: appending to the dataset invalidates the index
    emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    ).write.format("lance").mode("append").save(root)
    with pytest.raises(vi.StaleIndexError):
        vi.ann_search(spark, root, probes)
    # but the indexed snapshot stays searchable explicitly
    assert (
        vi.ann_search(spark, root, probes, allow_stale=True).count() > 0
    )
