"""Continuous aggregate: rollup+tail == direct, day-partition
pruning on the rollup store, tail boundary correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.operators import timeseries as ts
from lance_duckdb_spark.tables import load


@pytest.fixture(scope="module")
def store(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ts") / "rollup")
    ts.build_rollup_store(spark, sf_dir, d)
    return d


def test_rollup_query_equals_direct(spark, sf_dir, store):
    served = ts.rollup_query(spark, sf_dir, store).collect()
    hours = ts._hourly(spark, sf_dir)
    direct = (
        hours.join(F.broadcast(ts._max_hour(hours)))
        .where(F.col("hour_idx") > F.col("max_h") - ts.WINDOW_HOURS)
        .withColumn(
            "d",
            F.date_add(
                F.lit("1970-01-01"), F.expr("CAST(hour_idx DIV 24 AS INT)")
            ),
        )
        .groupBy("d", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .orderBy("d", "event_type")
        .collect()
    )
    assert [r.asDict() for r in served] == [r.asDict() for r in direct]


def test_rollup_serves_closed_hours(spark, sf_dir, store):
    """The store must cover every closed hour in the corpus — the
    query's raw scan is ONLY the tail."""
    rolled = spark.read.parquet(store)
    hours = ts._hourly(spark, sf_dir)
    max_h = hours.agg(F.max("hour_idx")).first()[0]
    expected = (
        hours.where(F.col("hour_idx") < max_h - ts.TAIL_HOURS)
        .select("hour_idx")
        .distinct()
        .count()
    )
    got = rolled.select("hour_idx").distinct().count()
    assert got == expected
    assert expected > 0
    # the store is pre-aggregated: far fewer rows than raw events
    assert rolled.count() < load(spark, sf_dir, "events").count()


def test_rollup_query_plan_prunes_day_partitions(spark, sf_dir, store):
    """rollup_query ITSELF (not a hand-written filter) must plan the
    store scan with a day_idx partition filter — the property that
    keeps dashboard IO independent of retention length."""
    df = ts.rollup_query(spark, sf_dir, store)
    plan = df._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters", 1)[1]
    assert "day_idx" in seg[:200]


def test_sketch_rollup_error_bound_and_mergeability(spark, sf_dir):
    """Merged daily HLL sketches must estimate month-distinct users
    within HLL's error envelope (lgK=12 → ~1.6% standard error; 5%
    asserted), and n_events (exact, carried beside the sketch) must
    match the raw count exactly."""
    rows = {r.event_type: r for r in ts.sketch_distinct_rollup(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert rows.keys() == exact.keys()
    for et, r in rows.items():
        e = exact[et]
        assert r.n_events == e.n  # exact payload carried with sketch
        assert r.exact_distinct_users == e.d
        # the estimate itself is folded into the hashed flag (r5)
        assert r.sketch_within_tol


def test_rollup_query_with_empty_closed_store(spark, tmp_path):
    """Events spanning <= TAIL_HOURS: every hour is in the open
    tail, the store holds no part files — the query must serve the
    tail-only summary instead of crashing on schema inference over
    a partitioned-but-empty parquet dir (r7 review finding)."""
    import os

    import pandas as pd

    sf = str(tmp_path / "shortspan")
    os.makedirs(sf)
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame(
        {
            "event_id": range(6),
            "user_id": [1, 2, 1, 2, 1, 2],
            "event_type": ["a", "b"] * 3,
            "value": [1.25, 2.5, 3.0, 4.75, 5.0, 6.25],
            "ts": [base + pd.Timedelta(hours=h) for h in range(6)],
            "properties": ["{}"] * 6,
        }
    ).to_parquet(f"{sf}/events.parquet")
    store = str(tmp_path / "short_store")
    ts.build_rollup_store(spark, sf, store)
    rows = ts.rollup_query(spark, sf, store).collect()
    assert {(r.event_type, r.n_events) for r in rows} == {("a", 3), ("b", 3)}
    assert abs(sum(r.sum_value for r in rows) - 22.75) < 1e-9


def test_rollup_query_serves_hours_past_a_stale_store(spark, tmp_path):
    """A store built BEFORE newer events arrived must not lose the
    hours between its recorded cutoff and query-time now-TAIL_HOURS:
    the raw tail starts at the STORE's cutoff (r7 review finding —
    previously those hours were read from neither side)."""
    import os

    import pandas as pd

    def write_events(path, n_hours):
        os.makedirs(path, exist_ok=True)
        base = pd.Timestamp("2024-01-01")
        pd.DataFrame(
            {
                "event_id": range(n_hours),
                "user_id": [1] * n_hours,
                "event_type": ["a"] * n_hours,
                "value": [1.0] * n_hours,
                "ts": [base + pd.Timedelta(hours=h) for h in range(n_hours)],
                "properties": ["{}"] * n_hours,
            }
        ).to_parquet(f"{path}/events.parquet")

    sf = str(tmp_path / "staledata")
    store = str(tmp_path / "stale_store")
    write_events(sf, 60)  # store covers hours < 60-24 = 36
    ts.build_rollup_store(spark, sf, store)
    write_events(sf, 120)  # 60 newer hours, store now stale
    rows = ts.rollup_query(spark, sf, store).collect()
    # full 7-day window over 120 one-event hours: nothing dropped
    assert sum(r.n_events for r in rows) == 120
    assert abs(sum(r.sum_value for r in rows) - 120.0) < 1e-9
