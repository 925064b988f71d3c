"""Central registry: merges every operator module's QUERIES/ORACLE.

Import failures in optional modules are not tolerated — every module
listed here is part of the declared SURVEY.md §2 surface.
"""

from __future__ import annotations

from .operators import (
    analytics,
    behavior,
    clustering,
    curation,
    dedup,
    joins,
    lance_ops,
    multimodal,
    pipeline,
    redaction,
    retrieval,
    similarity,
    sql_surface,
    sql_surface2,
    text,
    tpch,
    tpch2,
    tpch3,
    window_funcs,
)
from .streaming import jobs as streaming_jobs

_MODULES = [
    tpch,
    tpch2,
    curation,
    analytics,
    behavior,
    joins,
    text,
    similarity,
    dedup,
    clustering,
    lance_ops,
    multimodal,
    pipeline,
    retrieval,
    sql_surface,
    sql_surface2,
    tpch3,
    window_funcs,
    redaction,
    streaming_jobs,
]


def _merge(attr: str) -> dict:
    merged: dict = {}
    for mod in _MODULES:
        entries = getattr(mod, attr, {})
        overlap = merged.keys() & entries.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(entries)
    return merged


# The per-round correctness harness records at most ~50 queries, taken as a
# prefix of dict order (round 1 captured exactly queries 1-50 and dropped the
# rest).  Rotate the registry so queries with no recorded correctness row yet
# run first; everything else follows in its natural module order.  Round 1
# verified queries 1-50 of the old order, so round 2 fronts the 11 that were
# cut plus the queries added this round.
_FRONT = [
    # absent from CORRECTNESS_r01.json (driver 50-entry cap)
    "events_json_extract",
    "set_ops",
    "sql_api_priority_matrix",
    "string_funcs",
    "monthly_revenue",
    "case_buckets",
    "event_transitions",
    "window_rank_functions",
    "array_functions",
    "stream_windowed_counts",
    "session_window_native",
]


def _rotate(merged: dict) -> dict:
    front = {k: merged[k] for k in _FRONT if k in merged}
    # new queries (added after round 1) also lack correctness rows — front them
    known_r1 = {
        "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q10",
        "tpch_q14", "tpch_q18", "tpch_q7", "tpch_q13", "tpch_q19", "tpch_q22",
        "top_revenue_per_segment", "running_totals", "distinct_counts",
        "rollup_revenue", "percentiles", "stats_moments", "robust_stats",
        "pivot_events", "approx_quantiles_vs_exact", "cohort_retention",
        "funnel_steps", "asof_join_events_orders", "range_join_events",
        "sessionize_events", "anti_semi_joins", "lang_id", "quality_score",
        "token_count", "doc_fingerprint", "char_entropy", "embedding_neardup",
        "embedding_neardup_lsh", "ann_topk_bruteforce", "ann_ivf",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "ngram_jaccard",
        "dedup_clusters", "lance_roundtrip", "lance_time_travel",
        "lance_pushdown_scan", "lance_dataset_stats", "multimodal_pipeline",
        "stratified_sample", "filter_pipeline", "dedup_keep_best",
        "tfidf_top_terms",
    }
    for k in merged:
        if k not in front and k not in known_r1:
            front[k] = merged[k]
    for k in merged:
        if k not in front:
            front[k] = merged[k]
    return front


QUERY_REGISTRY = _rotate(_merge("QUERIES"))
ORACLE_REGISTRY = _rotate(_merge("ORACLE"))
