"""Streaming tests (SURVEY.md §2.D): lance stream source feeding a
windowed aggregation must equal the batch twin; the lance stream
sink appends one version per micro-batch; stateful sessionization
matches the batch sessionizer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.sources import lance_format as lf
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.streaming import jobs
from lance_duckdb_spark.tables import load


@pytest.fixture()
def events_lance(spark, sf_dir, tmp_path):
    """events table written into a lance dataset as 3 appended
    versions (simulating arrival over time)."""
    register(spark)
    root = str(tmp_path / "events.lance")
    ev = load(spark, sf_dir, "events")
    n = ev.count()
    b1 = ev.where(F.col("event_id") % 3 == 0)
    b2 = ev.where(F.col("event_id") % 3 == 1)
    b3 = ev.where(F.col("event_id") % 3 == 2)
    b1.write.format("lance").mode("overwrite").save(root)
    b2.write.format("lance").mode("append").save(root)
    b3.write.format("lance").mode("append").save(root)
    assert lf.list_versions(root) == [1, 2, 3]
    return root, n


def test_stream_windowed_counts_equals_batch(spark, sf_dir, events_lance, tmp_path):
    root, _ = events_lance
    stream = spark.readStream.format("lance").load(root)
    agg = jobs.windowed_counts_stream(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("select * from win_counts").collect()
    }
    expected_df = (
        jobs.with_event_time(load(spark, sf_dir, "events"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in expected_df.collect()
    }
    assert got == expected


def test_lance_stream_sink_appends_versions(spark, sf_dir, events_lance, tmp_path):
    root, n = events_lance
    out_root = str(tmp_path / "out.lance")
    stream = spark.readStream.format("lance").load(root)
    q = (
        stream.writeStream.format("lance")
        .option("path", out_root)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert lf.list_versions(out_root), "sink committed no versions"
    back = spark.read.format("lance").load(out_root)
    assert back.count() == n


def test_stateful_sessions_match_batch(spark, sf_dir, tmp_path):
    """Streamed closed sessions (EventTimeTimeout eviction) must
    equal the native batch sessionizer's completed sessions, and
    state must actually be EVICTED (bounded by active users inside
    the watermark horizon, not the all-time user population)."""
    emitted, q = jobs.staged_session_run(spark, sf_dir, "test_sessions")
    ev = load(spark, sf_dir, "events")
    umax = ev.groupBy("user_id").agg(F.max("ts_us").alias("max_ts"))
    got = sorted(
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in emitted.join(umax, "user_id")
        .where(F.col("end_us") != F.col("max_ts") + F.lit(jobs.SESSION_GAP_US))
        .select("user_id", "start_us", "end_us", "n_events")
        .collect()
    )
    batch = jobs.session_window_native(spark, sf_dir)
    expected = sorted(
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in batch.join(umax, "user_id")
        .where(F.col("end_us") != F.col("max_ts") + F.lit(jobs.SESSION_GAP_US))
        .select("user_id", "start_us", "end_us", "n_events")
        .collect()
    )
    assert got == expected
    assert len(got) > 0, "no completed sessions emitted (weak test)"


def test_session_state_eviction_on_timeout(spark, tmp_path):
    """A user who goes quiet must have their in-flight session
    emitted by the EventTimeTimeout and their state REMOVED — the
    property that bounds state by the active population inside the
    watermark horizon instead of the all-time user count."""
    register(spark)
    t0 = 1_600_000_000_000_000  # µs
    root = str(tmp_path / "evict.lance")
    out = str(tmp_path / "evict.out")
    slices = [
        # slice 1: user 1 bursts then goes quiet; user 2 appears
        [(1, t0), (1, t0 + 60_000_000), (2, t0 + 100_000_000)],
        # slice 2: only user 2 — watermark advances past user 1's
        # gap expiry (t0+60s+30min) once this slice is processed
        [(2, t0 + 2 * 3_600_000_000)],
        # slice 3: only user 2 — user 1's timeout fires HERE
        [(2, t0 + 4 * 3_600_000_000)],
    ]
    q = None
    for i, rows in enumerate(slices):
        df = spark.createDataFrame(rows, schema="user_id long, ts_us long")
        mode = "overwrite" if i == 0 else "append"
        df.coalesce(1).write.format("lance").mode(mode).save(root)
        q = (
            jobs.stateful_sessions_stream(
                spark.readStream.format("lance").load(root)
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "evict.ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    emitted = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    # user 1's session was closed by TIMEOUT (no closing event ever
    # arrived), and user 2's first session closed by gap
    assert (1, t0, t0 + 60_000_000 + jobs.SESSION_GAP_US, 2) in emitted
    assert (
        2,
        t0 + 100_000_000,
        t0 + 100_000_000 + jobs.SESSION_GAP_US,
        1,
    ) in emitted
    # and user 1's state row is GONE: only user 2 remains in store
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    assert progresses, "no state-operator progress recorded"
    final_rows = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    assert final_rows == 1, (
        f"state holds {final_rows} rows; expected 1 (user 1 evicted)"
    )


def test_session_interval_merge_algebra():
    """Direct unit coverage of the cross-batch session algebra (r9
    advice): a severely-late event splits into its own EARLIER
    session instead of stretching the open session backward; in-gap
    late events merge without moving last_ts backward; forward gaps
    still close."""
    from lance_duckdb_spark.streaming.jobs import (
        SESSION_GAP_US as GAP,
        _merge_session_intervals as merge,
    )

    t0 = 1_600_000_000_000_000
    # forward gap closes the open session
    done, open_iv = merge((t0, t0 + 10, 3), [t0 + GAP + 11])
    assert done == [(t0, t0 + 10, 3)]
    assert open_iv == (t0 + GAP + 11, t0 + GAP + 11, 1)
    # in-gap late event: absorbed, last_ts NOT moved backward
    done, open_iv = merge((t0, t0 + 1000, 2), [t0 + 500])
    assert done == []
    assert open_iv == (t0, t0 + 1000, 3)
    # severely-late event (> gap before start): its OWN earlier
    # session, open session untouched (pre-fix: start stretched back)
    late = t0 - GAP - 5
    done, open_iv = merge((t0, t0 + 10, 2), [late])
    assert done == [(late, late, 1)]
    assert open_iv == (t0, t0 + 10, 2)
    # two severely-late stragglers within a gap of each other form
    # ONE earlier session (far enough back that neither bridges)
    late2 = t0 - 2 * GAP
    done, open_iv = merge((t0, t0 + 10, 2), [late2, late2 + 100])
    assert done == [(late2, late2 + 100, 2)]
    assert open_iv == (t0, t0 + 10, 2)
    # late event within a gap of the open START bridges into it
    near_late = t0 - GAP
    done, open_iv = merge((t0, t0 + 10, 2), [near_late])
    assert done == []
    assert open_iv == (near_late, t0 + 10, 3)
    # fresh state (no prior session)
    done, open_iv = merge(None, [t0, t0 + 1, t0 + GAP + 2])
    assert done == [(t0, t0 + 1, 2)]
    assert open_iv == (t0 + GAP + 2, t0 + GAP + 2, 1)


def test_stream_sink_restart_is_exactly_once(spark, sf_dir, events_lance, tmp_path):
    """Re-running the stream with the same checkpoint AND a stable
    txnAppId must not double-append (epoch replay detection is keyed
    on (txn, batchId) — the Delta txnAppId pattern)."""
    root, n = events_lance
    out_root = str(tmp_path / "out2.lance")
    ckpt = str(tmp_path / "ckpt_restart")
    for _ in range(2):  # second start replays from the checkpoint
        q = (
            spark.readStream.format("lance")
            .load(root)
            .writeStream.format("lance")
            .option("path", out_root)
            .option("checkpointLocation", ckpt)
            .option("txnAppId", "restart-test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    back = spark.read.format("lance").load(out_root)
    assert back.count() == n, "restart duplicated rows"


def test_new_stream_query_data_never_discarded(spark, sf_dir, events_lance, tmp_path):
    """A NEW streaming query (fresh checkpoint, no txnAppId) whose
    batchIds restart at 0 must still have its data committed — epoch
    dedup applies only within one transaction id."""
    root, n = events_lance
    out_root = str(tmp_path / "out3.lance")
    for i in range(2):  # two independent queries, each batchId 0..
        q = (
            spark.readStream.format("lance")
            .load(root)
            .writeStream.format("lance")
            .option("path", out_root)
            .option("checkpointLocation", str(tmp_path / f"ckpt_q{i}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    back = spark.read.format("lance").load(out_root)
    assert back.count() == 2 * n, "second query's epochs were discarded"


def test_stream_sink_direct_replay_commit_is_noop(spark, sf_dir, tmp_path):
    """Unit-level: committing the same batchId twice keeps one
    version and removes the replayed fragments."""
    import pyarrow as pa

    from lance_duckdb_spark.sources import lance_format as lf2

    root = str(tmp_path / "replay.lance")
    schema_json = '{"type":"struct","fields":[{"name":"x","type":"long","nullable":true,"metadata":{}}]}'
    t = pa.table({"x": [1, 2, 3]})
    f1 = lf2.write_fragment(root, t)
    lf2.commit(root, schema_json, [f1], "append", stream_batch_id=0, stream_txn_id="q1")
    f2 = lf2.write_fragment(root, t)
    m = lf2.commit(root, schema_json, [f2], "append", stream_batch_id=0, stream_txn_id="q1")
    assert m.version == 1
    assert lf2.list_versions(root) == [1]
    assert len(lf2.read_manifest(root).fragments) == 1
    # a DIFFERENT transaction replaying batch 0 must commit normally
    f3 = lf2.write_fragment(root, t)
    m2 = lf2.commit(root, schema_json, [f3], "append", stream_batch_id=0, stream_txn_id="q2")
    assert m2.version == 2
    assert len(m2.fragments) == 2


def test_maintenance_preserves_stream_epoch_watermark(spark, tmp_path):
    """compact/delete must not reset the stream sink's epoch
    watermark — a replayed epoch after maintenance is still a
    no-op (review finding r1)."""
    import pyarrow as pa

    from lance_duckdb_spark.sources import lance_format as lf2

    root = str(tmp_path / "wm.lance")
    schema_json = '{"type":"struct","fields":[{"name":"x","type":"long","nullable":true,"metadata":{}}]}'
    t = pa.table({"x": list(range(10))})
    f1 = lf2.write_fragment(root, t)
    lf2.commit(root, schema_json, [f1], "append", stream_batch_id=5, stream_txn_id="qa")
    lf2.compact(root, target_rows=5)  # maintenance overwrite
    assert lf2.read_manifest(root).stream_batch_id == 5
    assert lf2.read_manifest(root).stream_txn_id == "qa"
    # replay of epoch 5 by the same txn after compaction: still dropped
    f2 = lf2.write_fragment(root, t)
    m = lf2.commit(root, schema_json, [f2], "append", stream_batch_id=5, stream_txn_id="qa")
    assert sum(fr.num_rows for fr in m.fragments) == 10


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE semantics: rows where the predicate is NULL are NOT
    deleted (review finding r1)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from lance_duckdb_spark.sources import lance_format as lf2

    root = str(tmp_path / "nulls.lance")
    schema_json = '{"type":"struct","fields":[{"name":"x","type":"long","nullable":true,"metadata":{}}]}'
    t = pa.table({"x": [0, 1, None]})
    f1 = lf2.write_fragment(root, t)
    lf2.commit(root, schema_json, [f1], "append")
    lf2.delete_where(root, pc.field("x") == 0)
    remaining = lf2.read_fragment(
        root, lf2.read_manifest(root).fragments[0]
    )["x"].to_pylist()
    assert remaining == [1, None]


def test_append_mode_across_triggers_matches_batch(spark, sf_dir, tmp_path):
    """Append-mode windowed aggregation over data arriving in two
    triggers (the second hours 'late') must equal the batch result
    over ALL data, with every window emitted exactly once. (Spark's
    watermark bounds state eviction; for state still present or
    re-creatable, late rows are aggregated correctly — this asserts
    the end-to-end exactly-once outcome, which is the contract a
    pipeline consumer relies on.)"""
    register(spark)
    root = str(tmp_path / "late.lance")
    ev = load(spark, sf_dir, "events")
    max_us = ev.agg(F.max("ts_us")).collect()[0][0]
    six_h = 6 * 3600 * 1_000_000
    recent = ev.where(F.col("ts_us") > max_us - six_h)
    late = ev.where(F.col("ts_us") <= max_us - six_h).limit(50)
    recent.write.format("lance").mode("overwrite").save(root)

    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    def run_trigger():
        stream = spark.readStream.format("lance").load(root)
        agg = jobs.windowed_counts_stream(stream)
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_trigger()
    late.write.format("lance").mode("append").save(root)
    run_trigger()
    run_trigger()  # extra no-new-data trigger flushes remaining windows

    emitted = spark.read.parquet(out).collect()
    keys = [(r.window_start, r.event_type) for r in emitted]
    assert len(keys) == len(set(keys)), "window emitted more than once"
    batch = (
        jobs.with_event_time(recent.unionByName(late))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
        .collect()
    )
    # append mode can only finalize windows whose END is below the
    # final watermark (max event time - 10 min); the last open
    # window is legitimately unemitted
    import datetime

    final_wm = datetime.datetime.utcfromtimestamp((max_us - 600_000_000) / 1e6)
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch
        if r.window_start + datetime.timedelta(hours=1) <= final_wm
    }
    got = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in emitted}
    assert got == expected


def test_interleaved_txn_watermarks_dedupe_independently(spark, tmp_path):
    """Two streaming queries interleaving appends to ONE dataset each
    dedupe replays against their OWN watermark (per-txn map, the
    Delta txn-action pattern) — a replay of q1's epoch after q2
    committed must still be a no-op (advice finding r1)."""
    import pyarrow as pa

    from lance_duckdb_spark.sources import lance_format as lf2

    root = str(tmp_path / "interleave.lance")
    schema_json = '{"type":"struct","fields":[{"name":"x","type":"long","nullable":true,"metadata":{}}]}'
    t = pa.table({"x": [1]})
    lf2.commit(root, schema_json, [lf2.write_fragment(root, t)], "append",
               stream_batch_id=0, stream_txn_id="q1")
    lf2.commit(root, schema_json, [lf2.write_fragment(root, t)], "append",
               stream_batch_id=0, stream_txn_id="q2")
    # q1 replays epoch 0 AFTER q2's commit landed in between: must be
    # dropped (the old single-slot watermark re-appended it)
    m = lf2.commit(root, schema_json, [lf2.write_fragment(root, t)], "append",
                   stream_batch_id=0, stream_txn_id="q1")
    assert len(m.fragments) == 2
    assert m.stream_txns == {"q1": 0, "q2": 0}
    # new epochs from both txns still commit
    m = lf2.commit(root, schema_json, [lf2.write_fragment(root, t)], "append",
                   stream_batch_id=1, stream_txn_id="q1")
    m = lf2.commit(root, schema_json, [lf2.write_fragment(root, t)], "append",
                   stream_batch_id=1, stream_txn_id="q2")
    assert len(m.fragments) == 4
    assert m.stream_txns == {"q1": 1, "q2": 1}


def test_commit_race_exclusive_create(spark, tmp_path, monkeypatch):
    """Two committers racing to the same next version: the loser must
    RETRY against the new head (append) or raise (expected_version),
    never silently overwrite the winner's manifest (advice r1)."""
    import pyarrow as pa

    from lance_duckdb_spark.sources import lance_format as lf2

    root = str(tmp_path / "race.lance")
    schema_json = '{"type":"struct","fields":[{"name":"x","type":"long","nullable":true,"metadata":{}}]}'
    t = pa.table({"x": [1]})
    lf2.commit(root, schema_json, [lf2.write_fragment(root, t)], "append")

    # simulate a concurrent commit landing between the head read and
    # the manifest publish: patch list_versions to sneak a competing
    # version 2 in on first call
    real_list = lf2.list_versions
    state = {"raced": False}

    def racing_list(r):
        versions = real_list(r)
        if not state["raced"]:
            state["raced"] = True
            competing = lf2.Manifest(2, schema_json, [], {})
            with open(lf2._manifest_path(r, 2), "w") as fh:
                import json as _json
                _json.dump(competing.to_json(), fh)
        return versions

    monkeypatch.setattr(lf2, "list_versions", racing_list)
    m = lf2.commit(root, schema_json, [lf2.write_fragment(root, t)], "append")
    monkeypatch.setattr(lf2, "list_versions", real_list)
    # loser retried: winner's v2 intact (empty), our commit became v3
    assert m.version == 3
    assert len(lf2.read_manifest(root, 2).fragments) == 0
    assert lf2.list_versions(root) == [1, 2, 3]

    # with expected_version set, the same race must raise, not retry
    state["raced"] = False

    def racing_list2(r):
        versions = real_list(r)
        if not state["raced"]:
            state["raced"] = True
            competing = lf2.Manifest(4, schema_json, [], {})
            with open(lf2._manifest_path(r, 4), "w") as fh:
                import json as _json
                _json.dump(competing.to_json(), fh)
        return versions

    monkeypatch.setattr(lf2, "list_versions", racing_list2)
    import pytest as _pytest
    with _pytest.raises(lf2.LanceDatasetError, match="concurrent commit"):
        lf2.commit(root, schema_json, [], "overwrite", expected_version=3)


def test_stream_offset_detects_prefix_rewrite(spark, tmp_path):
    """A rewrite that replaces an EARLIER fragment while keeping the
    count and the last file identical must be detected by the
    prefix-hash offset validation (advice r1)."""
    import pyarrow as pa
    import pytest as _pytest

    from lance_duckdb_spark.sources import datasource as ds
    from lance_duckdb_spark.sources import lance_format as lf2
    from pyspark.sql.types import StructType

    root = str(tmp_path / "prefix.lance")
    schema_json = '{"type":"struct","fields":[{"name":"x","type":"long","nullable":true,"metadata":{}}]}'
    t = pa.table({"x": [1]})
    for _ in range(3):
        lf2.commit(root, schema_json, [lf2.write_fragment(root, t)], "append")
    reader = ds.LanceStreamReader(root, StructType([]))
    start = reader.initialOffset()
    end = reader.latestOffset()
    assert len(reader.partitions(start, end)) == 3

    # rewrite fragment 0 only: same count, same last file
    m = lf2.read_manifest(root)
    new_first = lf2.write_fragment(root, pa.table({"x": [99]}))
    frags = [new_first] + list(m.fragments[1:])
    lf2.commit(root, m.schema_json, frags, "overwrite")
    reader2 = ds.LanceStreamReader(root, StructType([]))
    with _pytest.raises(lf2.LanceDatasetError, match="compacted/overwritten"):
        reader2.partitions(end, reader2.latestOffset())


def test_foreachbatch_epoch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """A micro-batch replayed after a crash (same epoch id) must not
    double-append pairs / signatures / rollup partials — the epoch-
    keyed overwrite contract in incdedup_process_batch /
    contagg_process_batch (r4 ADVICE)."""
    register(spark)
    docs = load(spark, sf_dir, "documents").limit(40)
    src = str(tmp_path / "replay.lance")
    docs.coalesce(1).write.format("lance").mode("overwrite").save(src)
    store = str(tmp_path / "sigstore")
    results = str(tmp_path / "pairs")

    jobs.incdedup_process_batch(spark, docs, 0, src, store, results)
    once_pairs = sorted(
        map(tuple, spark.read.parquet(results).drop("epoch").collect())
    )
    once_sigs = spark.read.parquet(store).count()
    # replay the same epoch
    jobs.incdedup_process_batch(spark, docs, 0, src, store, results)
    again_pairs = sorted(
        map(tuple, spark.read.parquet(results).drop("epoch").collect())
    )
    assert again_pairs == once_pairs
    assert spark.read.parquet(store).count() == once_sigs

    ev = load(spark, sf_dir, "events").limit(500)
    rollup = str(tmp_path / "rollup")
    jobs.contagg_process_batch(ev, 0, rollup)
    once = sorted(
        map(
            tuple,
            spark.read.parquet(rollup)
            .groupBy("event_type")
            .agg(F.sum("n").alias("n"))
            .collect(),
        )
    )
    jobs.contagg_process_batch(ev, 0, rollup)  # replay
    jobs.contagg_process_batch(ev, 1, rollup)  # a real second epoch
    after = sorted(
        map(
            tuple,
            spark.read.parquet(rollup)
            .groupBy("event_type")
            .agg(F.sum("n").alias("n"))
            .collect(),
        )
    )
    assert [(t, n * 2) for t, n in once] == after


def test_max_fragments_per_trigger_drains_backlog_in_steps(
    spark, sf_dir, tmp_path
):
    """Rate control: a 10-fragment burst appended under a RUNNING
    stream drains in >=5 capped micro-batches (2 fragments/trigger)
    with nothing lost or duplicated. The cap is advisory admission
    control — the first trigger after a cold start/availableNow
    target computation has no floor knowledge and is uncapped by
    design (the Python DS API's latestOffset gets no start offset)."""
    import time

    register(spark)
    root = str(tmp_path / "rate.lance")
    ev = load(spark, sf_dir, "events").limit(1000).cache()
    n_total = ev.count()
    ev.where(F.col("event_id") % 11 == 0).coalesce(1).write.format(
        "lance"
    ).mode("overwrite").save(root)
    batches = []

    def proc(df, epoch):
        batches.append((epoch, df.count()))

    q = (
        spark.readStream.format("lance")
        .option("maxFragmentsPerTrigger", "2")
        .load(root)
        .writeStream.foreachBatch(proc)
        .option("checkpointLocation", root + ".ckpt")
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 30  # seed batch commits
        while time.time() < deadline and sum(b for _, b in batches) == 0:
            time.sleep(0.5)
        for i in range(1, 11):  # burst: 10 fragments while running
            ev.where(F.col("event_id") % 11 == i).coalesce(1).write.format(
                "lance"
            ).mode("append").save(root)
        deadline = time.time() + 90
        while (
            time.time() < deadline
            and sum(b for _, b in batches) < n_total
        ):
            time.sleep(1)
    finally:
        q.stop()
    assert sum(b for _, b in batches) == n_total  # no loss, no dupes
    burst_batches = [b for _, b in batches[1:] if b > 0]
    assert len(burst_batches) >= 5, batches  # 10 frags / cap 2


def test_available_now_with_cap_drains_full_backlog(spark, sf_dir, tmp_path):
    """trigger(availableNow=True) pins its end target from the FIRST
    latestOffset snapshot and terminates there — so the first answer
    of a run must be UNCAPPED or backlog beyond maxFragmentsPerTrigger
    would be stranded when the query stops (r5 ADVICE). Every job in
    streaming/jobs.py uses availableNow; a capped run must still
    consume every pending fragment before terminating."""
    register(spark)
    root = str(tmp_path / "an_cap.lance")
    ev = load(spark, sf_dir, "events").limit(500).cache()
    n_total = ev.count()
    for i in range(5):  # 5-fragment backlog before the query starts
        mode = "overwrite" if i == 0 else "append"
        ev.where(F.col("event_id") % 5 == i).coalesce(1).write.format(
            "lance"
        ).mode(mode).save(root)
    seen = []

    def proc(df, epoch):
        seen.append(df.count())

    q = (
        spark.readStream.format("lance")
        .option("maxFragmentsPerTrigger", "2")
        .load(root)
        .writeStream.foreachBatch(proc)
        .option("checkpointLocation", root + ".ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert sum(seen) == n_total  # nothing stranded beyond the cap


def test_staged_runs_tolerate_empty_events(spark, tmp_path):
    """Empty events → _time_splits yields no slices → zero streaming
    passes ever write the output path. Every staged job must return
    an EMPTY typed frame instead of failing on the nonexistent dir
    (r5 ADVICE; matches the DAILY_SUMMARY_SCHEMA guard pattern)."""
    sf_tmp = str(tmp_path / "sf_empty")
    # raw schema (with the physical ts column), not the load()-derived one
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    raw.limit(0).write.parquet(f"{sf_tmp}/events.parquet")

    assert jobs.stream_sessionization(spark, sf_tmp).count() == 0
    assert jobs.stream_dedup(spark, sf_tmp).count() == 0
    assert jobs.stream_stream_join(spark, sf_tmp).count() == 0
    assert jobs.stream_sink_roundtrip(spark, sf_tmp).count() == 0


def test_cap_first_batch_option(spark, tmp_path):
    """capFirstBatch (r6 ADVICE): processing-time users can opt into
    a capped cold start. Reader-level: with the option, the FIRST
    latestOffset after a fresh initialOffset is already capped;
    without it, the first answer covers the whole backlog (the
    availableNow-safe default). Setting capFirstBatch without
    maxFragmentsPerTrigger is refused loudly — there is no cap to
    apply."""
    import pyarrow as pa
    import pytest as _pytest

    from lance_duckdb_spark.sources import datasource as ds
    from lance_duckdb_spark.sources import lance_format as lf2
    from pyspark.sql.types import StructType

    root = str(tmp_path / "capfirst.lance")
    schema_json = (
        '{"type":"struct","fields":'
        '[{"name":"x","type":"long","nullable":true,"metadata":{}}]}'
    )
    t = pa.table({"x": [1]})
    for _ in range(5):
        lf2.commit(root, schema_json, [lf2.write_fragment(root, t)], "append")

    uncapped = ds.LanceStreamReader(root, StructType([]), 2)
    uncapped.initialOffset()
    assert uncapped.latestOffset()["frag_count"] == 5  # availableNow-safe
    assert uncapped.latestOffset()["frag_count"] == 2  # capped from #2

    capped = ds.LanceStreamReader(
        root, StructType([]), 2, cap_first_batch=True
    )
    capped.initialOffset()
    assert capped.latestOffset()["frag_count"] == 2  # capped cold start

    # restart from checkpoint (no initialOffset): no floor knowledge,
    # capping blind would regress below the checkpoint — stays full
    resumed = ds.LanceStreamReader(
        root, StructType([]), 2, cap_first_batch=True
    )
    assert resumed.latestOffset()["frag_count"] == 5

    src = ds.LanceDataSource(
        {"path": root, "capFirstBatch": "true"}
    )
    with _pytest.raises(lf2.LanceDatasetError, match="maxFragmentsPerTrigger"):
        src.streamReader(StructType([]))
