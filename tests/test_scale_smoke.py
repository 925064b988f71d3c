"""Scale smoke (SURVEY.md §6): amplify the corpus ~20x and verify
the candidate-bounded dedup path still (a) completes in bounded
time and (b) finds the planted cross-copy duplicates — the
empirical check that the LSH equi-join shape, not an all-pairs
scan, is doing the work.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.operators.dedup import MINHASH_JACCARD_T, dedup_minhash_lsh
from lance_duckdb_spark.tables import load


@pytest.fixture(scope="module")
def amplified_dir(spark, sf_dir, tmp_path_factory):
    """documents x20: each copy keeps the text (same shingle set, so
    copies of one doc are jaccard-1.0 near-dups) under distinct
    doc_ids. 500 docs -> 10k docs, ~50x the candidate pressure."""
    out = str(tmp_path_factory.mktemp("amplified"))
    docs = load(spark, sf_dir, "documents")
    copies = F.explode(F.array(*[F.lit(i) for i in range(20)])).alias("copy")
    amplified = (
        docs.select("*", copies)
        .withColumn("doc_id", F.col("doc_id") * 20 + F.col("copy"))
        .drop("copy")
    )
    amplified.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    return out


def test_minhash_scales_and_finds_planted_dups(spark, amplified_dir):
    import time

    t0 = time.perf_counter()
    pairs = dedup_minhash_lsh(spark, amplified_dir).collect()
    elapsed = time.perf_counter() - t0
    # 10k docs => 50M naive pairs; the LSH path must stay far from that
    assert elapsed < 120, f"minhash took {elapsed}s on 10k docs"
    got = {(r.doc_a, r.doc_b) for r in pairs}
    # copies of the same original doc are exact near-dups; the 20
    # copies of doc 0 give 190 within-family pairs — require the
    # family to be found (banding catches jaccard-1.0 always)
    family0 = {(a, b) for a in range(20) for b in range(20) if a < b}
    assert family0 <= got, "planted duplicate family not fully recovered"
    for r in pairs:
        assert r.jaccard >= MINHASH_JACCARD_T


def test_tpch_agg_at_10x_scale(spark, tmp_path_factory):
    """Amplify lineitem sf0.1 x10 (~6M rows, TPC-H sf1-ish) and run
    the q1-shaped aggregation — runtime must stay in the
    seconds-not-minutes regime (partial agg + tiny shuffle), the
    empirical check that the plan scales linearly with input."""
    import time

    from pyspark.sql import functions as F

    from lance_duckdb_spark.operators.common import (
        charge_dec,
        dsum,
        money,
        revenue_dec,
    )

    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    copies = F.explode(F.array(*[F.lit(i) for i in range(10)])).alias("copy")
    big = (
        li.select("*", copies)
        .withColumn("l_orderkey", F.col("l_orderkey") * 10 + F.col("copy"))
        .drop("copy")
    )
    out = str(tmp_path_factory.mktemp("sf1")) + "/lineitem.parquet"
    big.write.mode("overwrite").parquet(out)

    big2 = spark.read.parquet(out)
    n = big2.count()
    assert n >= 5_000_000
    df = (
        big2.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(money("l_quantity"), "sum_qty"),
            dsum(revenue_dec(), "sum_disc_price"),
            dsum(charge_dec(), "sum_charge"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    df.collect()  # warm plan
    t0 = time.perf_counter()
    rows = df.collect()
    dt = time.perf_counter() - t0
    assert rows and sum(r.n for r in rows) == n
    assert dt < 30, f"q1-shaped agg over {n} rows took {dt}s"
