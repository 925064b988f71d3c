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
