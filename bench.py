"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: each query is built fresh, executed once to warm
(Catalyst analysis + whole-stage-codegen compile + parquet footer
cache — one-time costs a long-lived cluster amortizes), then the
reported number is the best of two timed executions (steady-state
wall time of plan + execute + collect). ``cold_total_sec`` reports
the first-execution total for transparency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lance_duckdb_spark.registry import QUERY_REGISTRY  # noqa: E402
from lance_duckdb_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # SQL analytics core
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18",
    "top_revenue_per_segment",
    "rollup_revenue",
    # join family
    "asof_join_events_orders",
    "sessionize_events",
    # training-data pipeline
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_neardup",
    "ann_topk_bruteforce",
    "token_count",
    # connector (includes write+read roundtrip)
    "lance_roundtrip",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("lance_duckdb_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERY_REGISTRY]
    timings: dict[str, float] = {}
    cold_total = 0.0
    total = 0.0
    for name in names:
        fn = QUERY_REGISTRY[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()  # cold: analysis+codegen+execute
        cold_total += time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        total += best

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_steady_state",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
                "cold_total_sec": round(cold_total, 4),
                "n_queries": len(names),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
