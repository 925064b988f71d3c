"""Skew helpers must produce results identical to the unsalted
plans (SURVEY.md §6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lance_duckdb_spark.operators.skew import replicate_salted_join, salted_agg
from lance_duckdb_spark.tables import load


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag, r.n, round(r.qty, 2))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.n, round(r.qty, 2))
        for r in salted_agg(
            li,
            ["l_returnflag"],
            lambda: [
                F.count(F.lit(1)).alias("pn"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pqty"),
            ],
            lambda: [
                F.sum("pn").alias("n"),
                F.sum("pqty").cast("double").alias("qty"),
            ],
            salt_col="l_orderkey",
        ).collect()
    }
    assert salted == plain


def test_replicate_salted_join_equals_plain_join(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = {
        (r.o_orderkey, r.c_name)
        for r in orders.join(cust, "o_custkey").select("o_orderkey", "c_name").collect()
    }
    salted = {
        (r.o_orderkey, r.c_name)
        for r in replicate_salted_join(
            orders, cust, key="o_custkey", big_unique_col="o_orderkey"
        )
        .select("o_orderkey", "c_name")
        .collect()
    }
    assert salted == plain


def test_ngram_df_cap_bounds_stop_gram_blowup(spark, tmp_path):
    """A single boilerplate string shared by EVERY doc of a source
    would make the (source, gram) self-join quadratic (500 docs →
    125k candidate pairs per boilerplate gram). The per-source gram
    df cap must drop those grams BEFORE the join, while a genuinely
    near-duplicate pair (sharing long UNIQUE text) still comes out.
    """
    import uuid as _uuid

    from lance_duckdb_spark.operators.dedup import ngram_jaccard

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(500):
        unique = f" tail {_uuid.uuid4().hex} {_uuid.uuid4().hex}"
        rows.append((i, boiler + unique, "en", "srcA", 0))
    # planted near-dup pair: long shared unique text, tiny suffix diff
    shared = "zq" + "x".join(_uuid.uuid4().hex for _ in range(20))
    rows.append((9001, shared + " alpha", "en", "srcA", 0))
    rows.append((9002, shared + " omega", "en", "srcA", 0))
    df = spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    )
    data_dir = tmp_path / "stress"
    data_dir.mkdir()
    df.coalesce(1).write.parquet(str(data_dir / "documents.parquet"))
    out = ngram_jaccard(spark, str(data_dir)).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    # the planted near-dup pair survives the cap...
    assert (9001, 9002) in pairs
    # ...and NO boilerplate-only pair does: every shared gram among
    # the 500 boilerplate docs has df=500 > cap and was dropped
    assert all(a == 9001 and b == 9002 for a, b in pairs), (
        f"stop-gram pairs leaked through the cap: {sorted(pairs)[:5]}"
    )


def test_skewed_hot_key_agg_balanced(spark, sf_dir):
    """The planted-skew driver query's partial stage must split the
    hot key across all SKEW_SALTS reducer groups: no single (key,
    salt) group may hold more than ~1/SKEW_SALTS of the hot key's
    rows (2x slack for hash unevenness)."""
    from lance_duckdb_spark.operators.skew import SKEW_SALTS, _hot_key

    ev = load(spark, sf_dir, "events").withColumn("skew_key", _hot_key())
    salted = ev.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(SKEW_SALTS))
    )
    sizes = (
        salted.where(F.col("skew_key") == -1)
        .groupBy("salt")
        .count()
        .collect()
    )
    hot_total = sum(r["count"] for r in sizes)
    assert hot_total > 0
    assert len(sizes) == SKEW_SALTS  # every salt lane is used
    assert max(r["count"] for r in sizes) <= 2 * hot_total / SKEW_SALTS


def test_skewed_hot_key_agg_two_phase_plan(spark, sf_dir):
    """The salted plan must re-aggregate partials, never shuffle raw
    hot-key rows: the physical plan has two distinct aggregation
    keys (key+salt, then key alone)."""
    from lance_duckdb_spark.operators.skew import skewed_hot_key_agg

    plan = skewed_hot_key_agg(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # the salted partial stage appears as an agg keyed on the temp salt col
    assert "_salt_" in plan


def test_skewed_hot_key_join_salted_plan_and_balance(spark, sf_dir):
    """The fact⋈fact driver join must shuffle on (key, salt), never
    on the bare hot key: the physical join keys include the salt
    column, and no (hot key, salt) bucket on the big side holds more
    than ~1/SKEW_SALTS of the hot key's rows (2x hash slack) — i.e.
    no single task receives the hot key's full row set."""
    from lance_duckdb_spark.operators.skew import (
        SKEW_SALTS,
        _hot_key,
        skewed_hot_key_join,
    )

    df = skewed_hot_key_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_lines = [
        ln for ln in plan.splitlines() if "Join" in ln and "_salt_" in ln
    ]
    assert join_lines, plan  # salt participates in the join keys

    # balance of the big side's join buckets (same salt formula the
    # helper applies: hash(event_id) % SKEW_SALTS)
    ev = load(spark, sf_dir, "events").withColumn("skew_key", _hot_key())
    sizes = (
        ev.where(F.col("skew_key") == -1)
        .withColumn(
            "salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(SKEW_SALTS))
        )
        .groupBy("salt")
        .count()
        .collect()
    )
    hot_total = sum(r["count"] for r in sizes)
    assert hot_total > 0 and len(sizes) == SKEW_SALTS
    assert max(r["count"] for r in sizes) <= 2 * hot_total / SKEW_SALTS


def test_salted_join_bounds_task_input_with_aqe_off(spark, sf_dir):
    """r6 VERDICT item 7: prove the SALT (not AQE's skew-join
    handling) is what bounds per-task rows. With
    spark.sql.adaptive.enabled=false:

    1. the salted join still returns exactly the plain join's rows;
    2. the static physical plan (no AdaptiveSparkPlan) joins on
       (key, salt);
    3. executing the join's own exchange — HashPartitioning on
       (key, salt) over the big side, which is what each join task
       reads with AQE off — no task receives more than (buckets
       landing on it) x (max bucket size) rows of the hot key, with
       max bucket size itself bounded at ~2/SKEW_SALTS of the hot
       rows (the balance the other tests assert). The partition
       count is PINNED (not read from session conf) so the
       murmur3 bucket->partition placement — and therefore the
       collision structure this assertion tolerates — is identical
       on every run and under any SPARK_GRAFT_SHUFFLE_PARTITIONS.
    """
    from lance_duckdb_spark.operators.skew import (
        SKEW_SALTS,
        _hot_key,
        replicate_salted_join,
    )

    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        ev = load(spark, sf_dir, "events").withColumn("skew_key", _hot_key())
        big = ev.select("skew_key", "event_type", "event_id")
        profile = (
            ev.groupBy("skew_key")
            .agg(F.count(F.lit(1)).alias("key_n"))
        )
        joined = replicate_salted_join(
            big, profile, key="skew_key", big_unique_col="event_id",
            n_salts=SKEW_SALTS,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan" not in plan  # AQE is really off
        assert any(
            "Join" in ln and "_salt_" in ln for ln in plan.splitlines()
        ), plan

        got = {
            (r.event_id, r.key_n)
            for r in joined.select("event_id", "key_n").collect()
        }
        want = {
            (r.event_id, r.key_n)
            for r in big.join(profile, "skew_key")
            .select("event_id", "key_n")
            .collect()
        }
        assert got == want

        # real exchange, real task inputs: repartition by the join's
        # own keys (the exact HashPartitioning the static join plan
        # shuffles the big side with) and count the hot key's rows
        # that each physical partition actually receives
        n_parts = 64  # pinned: deterministic murmur3 placement
        big_salted = big.withColumn(
            "salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(SKEW_SALTS))
        )
        per_task = (
            big_salted.repartition(n_parts, F.col("skew_key"), F.col("salt"))
            .withColumn("task", F.spark_partition_id())
            .where(F.col("skew_key") == -1)
            .groupBy("task")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.countDistinct("salt").alias("buckets"),
            )
            .collect()
        )
        hot_total = sum(r["rows"] for r in per_task)
        assert hot_total > 0
        # the salting guarantee: a task only ever holds its buckets'
        # rows, and every bucket is ≤ ~1/SKEW_SALTS of the hot rows
        # (2x hash slack). Any bucket->partition collision shows up
        # in `buckets` and scales the bound, instead of failing the
        # test while the remedy is intact.
        bucket_cap = 2 * hot_total / SKEW_SALTS
        for r in per_task:
            assert r["rows"] <= r["buckets"] * bucket_cap
        # anti-concentration: the hot key is genuinely spread — no
        # task re-assembled even a quarter of it, and at least half
        # the salt lanes landed on distinct tasks
        assert max(r["rows"] for r in per_task) <= hot_total / 4
        assert len(per_task) >= SKEW_SALTS // 2
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
