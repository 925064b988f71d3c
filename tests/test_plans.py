"""Physical-plan assertions (SURVEY.md §5/§6): the plans must be the
ones we would want on a 1000-executor cluster, not just plans that
happen to produce correct rows.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from lance_duckdb_spark.operators import dedup, joins, tpch
from lance_duckdb_spark.plans.checks import (
    assert_no_quadratic_join,
    executed_plan as _plan,
    pushed_filters,
    read_schema,
)
from lance_duckdb_spark.tables import load


def test_q6_filter_pushdown_reaches_parquet(spark, sf_dir):
    pushed = pushed_filters(tpch.tpch_q6(spark, sf_dir))
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_q6_column_pruning(spark, sf_dir):
    rs = read_schema(tpch.tpch_q6(spark, sf_dir))
    # only the four needed columns are read from an 11-column table
    assert "l_extendedprice" in rs
    assert "l_returnflag" not in rs
    assert "l_orderkey" not in rs


def test_dim_joins_are_broadcast(spark, sf_dir):
    for q in (tpch.tpch_q3, tpch.tpch_q5, tpch.tpch_q10):
        plan = _plan(q(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, f"{q.__name__}:\n{plan}"


def test_q1_has_partial_aggregation(spark, sf_dir):
    # map-side combine: two HashAggregate nodes around one Exchange
    plan = _plan(tpch.tpch_q1(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    agg_section = plan.split("Sort")[-1]
    assert "Exchange" in agg_section


def test_q1_wholestage_codegen(spark, sf_dir):
    df = tpch.tpch_q1(spark, sf_dir)
    codegen_plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE wraps the plan; the scan→filter→partial-agg chain must be
    # codegen'd (marked by '*(n)' prefixes in the simple string)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in final or "WholeStageCodegen" in codegen_plan


def test_asof_join_single_shuffle(spark, sf_dir):
    # the asof implementation must shuffle on user_id exactly once
    # (union + one window), never a nested-loop join
    assert_no_quadratic_join(joins.asof_join_events_orders(spark, sf_dir))


def test_minhash_band_join_is_equijoin(spark, sf_dir):
    plan = _plan(dedup.dedup_minhash_lsh(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_no_collect_in_fact_queries(spark, sf_dir):
    # smoke: building every registered query must not trigger a job
    # (no eager .collect inside operator construction) — except the
    # similarity ops that legitimately broadcast a small probe set
    from lance_duckdb_spark.registry import QUERY_REGISTRY

    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    # each spark.read.parquet runs exactly ONE tiny footer/schema
    # metadata job; anything beyond 1-job-per-table-read means an
    # operator materialized data at build time
    QUERY_REGISTRY["tpch_q1"](spark, sf_dir)  # reads 1 table
    QUERY_REGISTRY["dedup_minhash_lsh"](spark, sf_dir)  # reads 1 table
    after = tracker.getJobIdsForGroup(None)
    assert len(after) - len(before) <= 2, "operator construction ran Spark jobs"


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """§6: bucketing both fact tables on the join key pre-partitions
    the data so the join needs NO Exchange — the co-located-join
    strategy for repeated fact-fact joins at scale."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_contamination_join_is_equijoin(spark, sf_dir):
    from lance_duckdb_spark.operators import curation

    plan = _plan(curation.contamination_check(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cross_source_overlap_is_equijoin(spark, sf_dir):
    from lance_duckdb_spark.operators import curation

    plan = _plan(curation.cross_source_overlap(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_contamination_bloom_corpus_side_never_shuffles(spark, sf_dir):
    """The bloom path's whole point: corpus grams are probed inside
    the Arrow worker and only candidates become rows — so between
    the corpus scan and the recheck join there must be NO shuffle
    exchange, and the recheck's bench side must broadcast."""
    from lance_duckdb_spark.operators import curation

    plan = _plan(curation.contamination_bloom(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # recheck joins broadcast bench
    assert "CartesianProduct" not in plan
    # walk the plan segment from the probe (MapInPandas over text) up
    # to the join: the candidate stream must reach the broadcast join
    # without an intermediate shuffle. The only shuffle exchanges in
    # the whole plan belong to the final source aggregate (and the
    # round-robin repartition that spreads the one-row-group scan).
    joins_at = plan.index("BroadcastHashJoin")
    below_join = plan[joins_at:]
    probe_at = below_join.index("MapInPandas")
    assert "Exchange hashpartitioning" not in below_join[:probe_at]


def test_repetition_filter_is_single_scan(spark, sf_dir):
    # narrow per-doc computation: no join, no window — one scan and
    # one partial-agg exchange
    from lance_duckdb_spark.operators import curation

    plan = _plan(curation.repetition_filter(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg + sort


def test_boilerplate_lines_never_shuffles_text(spark, sf_dir):
    # explode -> md5 -> two aggs: no join back to the corpus, so the
    # wide text column stays inside the scan stage
    from lance_duckdb_spark.operators import curation

    plan = _plan(curation.boilerplate_lines(spark, sf_dir))
    assert "Join" not in plan


def test_incremental_dedup_candidates_are_equijoin(spark, sf_dir):
    from lance_duckdb_spark.operators import dedup as dd

    plan = _plan(dd.dedup_incremental(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
