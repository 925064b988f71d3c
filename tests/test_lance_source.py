"""Lance connector tests (SURVEY.md §2.A, §5): roundtrip, schema,
time travel, append atomicity, pruning/pushdown, error cases —
mirroring the reference's test/sql/lance.test (scan + error
handling) plus the versioning semantics its format implies.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.sources import lance_format as lf
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.tables import load


@pytest.fixture()
def tmp_ds(tmp_path):
    return str(tmp_path / "ds.lance")


def test_roundtrip_and_schema(spark, sf_dir, tmp_ds):
    register(spark)
    cust = load(spark, sf_dir, "customer")
    cust.write.format("lance").mode("overwrite").save(tmp_ds)

    back = spark.read.format("lance").load(tmp_ds)
    assert back.schema == cust.schema
    assert back.count() == cust.count()
    assert sorted(r.c_custkey for r in back.collect()) == sorted(
        r.c_custkey for r in cust.collect()
    )
    # layout parity with the reference dataset model
    assert os.path.isdir(os.path.join(tmp_ds, "_versions"))
    assert os.path.isdir(os.path.join(tmp_ds, "data"))


def test_append_and_time_travel(spark, sf_dir, tmp_ds):
    register(spark)
    orders = load(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    new = orders.where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
    old.write.format("lance").mode("overwrite").save(tmp_ds)
    new.write.format("lance").mode("append").save(tmp_ds)

    assert lf.list_versions(tmp_ds) == [1, 2]
    v1 = spark.read.format("lance").option("version", 1).load(tmp_ds)
    v2 = spark.read.format("lance").load(tmp_ds)
    assert v1.count() == old.count()
    assert v2.count() == orders.count()


def test_append_schema_mismatch_rejected(spark, sf_dir, tmp_ds):
    register(spark)
    load(spark, sf_dir, "customer").write.format("lance").mode("overwrite").save(tmp_ds)
    with pytest.raises(Exception, match="schema mismatch"):
        load(spark, sf_dir, "nation").write.format("lance").mode("append").save(
            tmp_ds
        )
    # failed append must not have published a new version
    assert lf.list_versions(tmp_ds) == [1]


def test_missing_dataset_errors(spark, tmp_path):
    # reference: lance_scan('dummy_path.lance') errors cleanly
    register(spark)
    with pytest.raises(Exception, match="not a lance dataset"):
        spark.read.format("lance").load(str(tmp_path / "nope.lance")).collect()


def test_bad_version_errors(spark, sf_dir, tmp_ds):
    register(spark)
    load(spark, sf_dir, "nation").write.format("lance").mode("overwrite").save(tmp_ds)
    with pytest.raises(Exception, match="version 9 not found"):
        spark.read.format("lance").option("version", 9).load(tmp_ds).collect()


def test_filter_pushdown_reaches_reader(spark, sf_dir, tmp_ds):
    register(spark)
    load(spark, sf_dir, "customer").write.format("lance").mode("overwrite").save(tmp_ds)
    df = (
        spark.read.format("lance")
        .load(tmp_ds)
        .where(F.col("c_custkey") < 10)
        .select("c_custkey", "c_name")
    )
    rows = df.collect()
    assert rows and all(r.c_custkey < 10 for r in rows)
    # the pushed predicate is consumed by the source: no Filter node
    # remains above the BatchScan in the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert "BatchScan lance" in plan, plan
    assert not re.search(r"\bFilter \(", plan), f"filter not pushed:\n{plan}"
    # a non-pushable predicate must stay in the plan
    df2 = (
        spark.read.format("lance")
        .load(tmp_ds)
        .where(F.length("c_name") > 3)
    )
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"\bFilter \(", plan2), plan2


def test_fragment_parallelism(spark, sf_dir, tmp_ds):
    register(spark)
    cust = load(spark, sf_dir, "customer").repartition(4)
    cust.write.format("lance").mode("overwrite").save(tmp_ds)
    manifest = lf.read_manifest(tmp_ds)
    assert len(manifest.fragments) == 4
    back = spark.read.format("lance").load(tmp_ds)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == cust.count()


def test_query_over_lance_matches_parquet(spark, sf_dir, tmp_ds):
    register(spark)
    li = load(spark, sf_dir, "lineitem")
    li.write.format("lance").mode("overwrite").save(tmp_ds)
    lance_li = spark.read.format("lance").load(tmp_ds)
    for df in (li, lance_li):
        df.createOrReplaceTempView("li_cmp")
        spark.catalog.dropTempView("li_cmp")
    a = (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    b = (
        lance_li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted((r.l_returnflag, r.n) for r in a) == sorted(
        (r.l_returnflag, r.n) for r in b
    )


def test_compaction_preserves_data_and_versions(spark, sf_dir, tmp_ds):
    register(spark)
    li = load(spark, sf_dir, "lineitem").repartition(8)
    li.write.format("lance").mode("overwrite").save(tmp_ds)
    assert len(lf.read_manifest(tmp_ds).fragments) == 8
    before = spark.read.format("lance").load(tmp_ds).count()

    lf.compact(tmp_ds, target_rows=10**9)  # everything into one
    m = lf.read_manifest(tmp_ds)
    assert m.version == 2
    assert len(m.fragments) == 1
    after_df = spark.read.format("lance").load(tmp_ds)
    assert after_df.count() == before
    # old version still readable (time travel across compaction)
    v1 = spark.read.format("lance").option("version", 1).load(tmp_ds)
    assert v1.count() == before


def test_type_fidelity_roundtrip(spark, tmp_ds):
    """Type-map parity with the reference (rust/types.rs:3-48):
    every type the reference round-trips — bool, int8..64, float32/
    float64, string, binary, date, timestamp, decimal128, list,
    struct — must survive lance write->read with schema intact."""
    import datetime
    from decimal import Decimal

    register(spark)
    df = spark.createDataFrame(
        [
            (
                True, 1, 2, 3, 4, 1.5, 2.5, "s", bytearray(b"\x01\x02"),
                datetime.date(2024, 1, 2),
                datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
                Decimal("12345.67"),
                [1.0, 2.0],
                {"a": 7, "b": "x"},
            )
        ],
        schema=(
            "b boolean, i8 tinyint, i16 smallint, i32 int, i64 bigint, "
            "f float, d double, s string, bin binary, dt date, "
            "ts timestamp_ntz, dec decimal(18,2), lst array<double>, "
            "st struct<a:int,b:string>"
        ),
    )
    df.write.format("lance").mode("overwrite").save(tmp_ds)
    back = spark.read.format("lance").load(tmp_ds)
    assert back.schema == df.schema
    assert back.collect() == df.collect()


def test_delete_where(spark, sf_dir, tmp_ds):
    import pyarrow.compute as pc

    register(spark)
    load(spark, sf_dir, "nation").write.format("lance").mode("overwrite").save(tmp_ds)
    lf.delete_where(tmp_ds, pc.field("n_regionkey") == 0)

    def fresh():  # see LanceScanReader docstring: fresh load per query
        return spark.read.format("lance").load(tmp_ds)

    assert fresh().where(F.col("n_regionkey") == 0).count() == 0
    assert fresh().count() == 20  # 25 nations, 5 per region
    # pre-delete version still intact
    v1 = spark.read.format("lance").option("version", 1).load(tmp_ds)
    assert v1.count() == 25


def test_fresh_load_per_query_pattern(spark, sf_dir, tmp_ds):
    """Documents the Spark 4.1 python-datasource planning-cache
    limitation: a reused DataFrame replays the first action's pushed
    filters. Fresh load() per query is the supported pattern. If
    this test ever FAILS on the first assertion, upstream fixed the
    caching and the docstring/note can be dropped."""
    register(spark)
    load(spark, sf_dir, "nation").write.format("lance").mode("overwrite").save(tmp_ds)
    shared = spark.read.format("lance").load(tmp_ds)
    assert shared.where(F.col("n_regionkey") == 0).count() == 5
    assert shared.count() == 5  # <- stale pushdown; upstream behavior
    assert spark.read.format("lance").load(tmp_ds).count() == 25  # fresh is correct


def test_upsert_replaces_and_appends(spark, sf_dir, tmp_ds):
    from lance_duckdb_spark.sources.maintenance import upsert

    register(spark)
    nation = load(spark, sf_dir, "nation")
    nation.write.format("lance").mode("overwrite").save(tmp_ds)
    updates = spark.createDataFrame(
        [(0, "NATION_0_RENAMED", 9), (99, "NATION_99_NEW", 9)],
        schema=nation.schema,
    )
    upsert(spark, tmp_ds, updates, key="n_nationkey")
    back = spark.read.format("lance").load(tmp_ds)
    assert back.count() == 26
    got = {r.n_nationkey: r.n_name for r in back.collect()}
    assert got[0] == "NATION_0_RENAMED"
    assert got[99] == "NATION_99_NEW"
    assert got[1] == "NATION_1"
    # single new version, and the old state is one version back
    assert lf.list_versions(tmp_ds)[-1] == 2
    v1 = spark.read.format("lance").option("version", 1).load(tmp_ds)
    assert v1.count() == 25


def test_compression_option(spark, sf_dir, tmp_path):
    register(spark)
    li = load(spark, sf_dir, "lineitem")
    roots = {}
    for comp in ("none", "zstd"):
        root = str(tmp_path / f"{comp}.lance")
        li.write.format("lance").option("compression", comp).mode(
            "overwrite"
        ).save(root)
        size = sum(
            os.path.getsize(os.path.join(root, "data", f))
            for f in os.listdir(os.path.join(root, "data"))
        )
        roots[comp] = (root, size)
        assert spark.read.format("lance").load(root).count() == li.count()
    assert roots["zstd"][1] < roots["none"][1]


def test_zone_map_fragment_skipping(spark, sf_dir, tmp_ds):
    """Range filters on a range-partitioned write must scan only the
    overlapping fragments (manifest-level data skipping, no IO for
    the rest)."""
    register(spark)
    li = load(spark, sf_dir, "lineitem").repartitionByRange(8, "l_orderkey")
    li.write.format("lance").mode("overwrite").save(tmp_ds)
    m = lf.read_manifest(tmp_ds)
    assert len(m.fragments) == 8
    assert all(f.stats and "l_orderkey" in f.stats for f in m.fragments)

    lo, hi = 10, 50  # narrow key range -> 1-2 fragments
    df = (
        spark.read.format("lance")
        .load(tmp_ds)
        .where((F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi))
    )
    n_parts = df.rdd.getNumPartitions()
    assert n_parts <= 2, f"zone map did not skip fragments: {n_parts} partitions"
    expected = (
        load(spark, sf_dir, "lineitem")
        .where((F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi))
        .count()
    )
    assert df.count() == expected


def test_zone_map_string_equality_skipping(spark, sf_dir, tmp_ds):
    register(spark)
    li = load(spark, sf_dir, "lineitem").repartitionByRange(3, "l_returnflag")
    li.write.format("lance").mode("overwrite").save(tmp_ds)
    df = (
        spark.read.format("lance")
        .load(tmp_ds)
        .where(F.col("l_returnflag") == "R")
    )
    total_frags = len(lf.read_manifest(tmp_ds).fragments)
    assert df.rdd.getNumPartitions() < total_frags
    expected = (
        load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").count()
    )
    assert df.count() == expected


def test_upsert_is_fragment_pruned(spark, sf_dir, tmp_ds):
    """Zone maps make upsert rewrite only overlapping fragments —
    the others are carried into the new version by file reference."""
    from lance_duckdb_spark.sources.maintenance import upsert

    register(spark)
    li = load(spark, sf_dir, "lineitem").repartitionByRange(8, "l_orderkey")
    li.write.format("lance").mode("overwrite").save(tmp_ds)
    before = {f.file for f in lf.read_manifest(tmp_ds).fragments}

    # touch a single narrow key range
    updates = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey").between(10, 20))
        .withColumn("l_quantity", F.lit(99.0))
    )
    n_updates = updates.count()
    assert n_updates > 0
    upsert(spark, tmp_ds, updates, key="l_orderkey")

    after_manifest = lf.read_manifest(tmp_ds)
    after = {f.file for f in after_manifest.fragments}
    carried = before & after
    assert len(carried) >= 6, f"only {len(carried)} of 8 fragments carried"

    back = spark.read.format("lance").load(tmp_ds)
    assert back.count() == li.count()
    changed = spark.read.format("lance").load(tmp_ds).where(
        F.col("l_quantity") == 99.0
    )
    assert changed.count() == n_updates


def test_upsert_null_key_batches(spark, sf_dir, tmp_path):
    """All-NULL-key and mixed-null-key update batches must fail
    loudly instead of silently dropping / inconsistently appending
    (advice r1); an empty updates frame is a clean no-op."""
    import pytest as _pytest

    from lance_duckdb_spark.sources import lance_format as lf2
    from lance_duckdb_spark.sources.maintenance import upsert

    register(spark)
    root = str(tmp_path / "nullkey.lance")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    base.write.format("lance").mode("overwrite").save(root)

    v_before = lf2.read_manifest(root).version
    empty = spark.createDataFrame([], "k int, v string")
    upsert(spark, root, empty, key="k")  # no-op, no new version
    assert lf2.read_manifest(root).version == v_before

    all_null = spark.createDataFrame([(None, "x")], "k int, v string")
    with _pytest.raises(lf2.LanceDatasetError, match="NULL merge key"):
        upsert(spark, root, all_null, key="k")

    mixed = spark.createDataFrame([(1, "x"), (None, "y")], "k int, v string")
    with _pytest.raises(lf2.LanceDatasetError, match="NULL merge key"):
        upsert(spark, root, mixed, key="k")
    # dataset unchanged by the failed upserts
    assert lf2.read_manifest(root).version == v_before
    got = spark.read.format("lance").load(root).orderBy("k").collect()
    assert [(r.k, r.v) for r in got] == [(1, "a"), (2, "b")]


def test_in_filter_with_null_pushdown(spark, sf_dir, tmp_path):
    """`x IN (..., NULL)` pushed to the reader must not return rows
    whose x is NULL (Spark semantics: NULL in-list never matches a
    null value; advice r1)."""
    register(spark)
    root = str(tmp_path / "innull.lance")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c")], "k int, v string"
    )
    df.write.format("lance").mode("overwrite").save(root)
    got = (
        spark.read.format("lance")
        .load(root)
        .filter(F.col("k").isin(1, None))
        .collect()
    )
    assert [(r.k, r.v) for r in got] == [(1, "a")]


def test_begin_version_incremental_read(spark, tmp_path):
    """CDC read: begin_version scans only fragments appended after
    the given version; a rewrite in between fails loudly (the
    file-name diff is only the row diff for append-only history)."""
    import pyarrow.compute as pc

    from lance_duckdb_spark.sources import lance_format as lf2

    register(spark)
    root = str(tmp_path / "cdc.lance")
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").write.format(
        "lance"
    ).mode("overwrite").save(root)
    spark.createDataFrame([(3, "c")], "k int, v string").write.format(
        "lance"
    ).mode("append").save(root)
    spark.createDataFrame([(4, "d")], "k int, v string").write.format(
        "lance"
    ).mode("append").save(root)

    diff1 = (
        spark.read.format("lance").option("begin_version", 1).load(root)
    )
    assert sorted((r.k, r.v) for r in diff1.collect()) == [(3, "c"), (4, "d")]
    diff2 = (
        spark.read.format("lance").option("begin_version", 2).load(root)
    )
    assert [(r.k, r.v) for r in diff2.collect()] == [(4, "d")]
    # begin == end -> empty diff
    v = lf2.read_manifest(root).version
    empty = (
        spark.read.format("lance").option("begin_version", v).load(root)
    )
    assert empty.count() == 0

    # rewrite breaks append-only lineage: must raise, not misreport
    lf2.delete_where(root, pc.field("k") == 1)
    with pytest.raises(Exception, match="append-only"):
        spark.read.format("lance").option("begin_version", 1).load(
            root
        ).count()


def test_deletion_vector_delete(spark, sf_dir, tmp_ds):
    """Deletion-vector delete: rows disappear from scans, data files
    are untouched (no rewrite IO), repeated deletes merge positions,
    and old versions still time-travel to the pre-delete state."""
    import pyarrow.compute as pc

    register(spark)
    orders = load(spark, sf_dir, "orders")
    orders.repartition(4).write.format("lance").mode("overwrite").save(tmp_ds)
    files_before = {f.file for f in lf.read_manifest(tmp_ds).fragments}

    lf.delete_where(
        tmp_ds, pc.field("o_totalprice") > 200000.0, use_deletion_vectors=True
    )
    man2 = lf.read_manifest(tmp_ds)
    assert {f.file for f in man2.fragments} <= files_before  # no new data files
    assert any(f.deletion_file for f in man2.fragments)

    got = spark.read.format("lance").load(tmp_ds)
    exp = orders.where(~(F.col("o_totalprice") > 200000.0))
    assert got.count() == exp.count()

    # second delete merges into existing vectors, still no rewrite
    lf.delete_where(
        tmp_ds, pc.field("o_orderstatus") == "F", use_deletion_vectors=True
    )
    man3 = lf.read_manifest(tmp_ds)
    assert {f.file for f in man3.fragments} <= files_before
    got2 = spark.read.format("lance").load(tmp_ds)
    exp2 = orders.where(
        ~(F.col("o_totalprice") > 200000.0) & ~(F.col("o_orderstatus") == "F")
    )
    assert got2.count() == exp2.count()
    # deleted-position bookkeeping is consistent
    assert sum(f.num_deleted for f in man3.fragments) == (
        orders.count() - exp2.count()
    )

    # pre-delete version unaffected
    v1 = spark.read.format("lance").option("version", 1).load(tmp_ds)
    assert v1.count() == orders.count()


def test_deletion_vector_pushdown_interaction(spark, sf_dir, tmp_ds):
    """Pushed value filters must apply AFTER the positional mask."""
    import pyarrow.compute as pc

    register(spark)
    orders = load(spark, sf_dir, "orders")
    orders.write.format("lance").mode("overwrite").save(tmp_ds)
    lf.delete_where(
        tmp_ds, pc.field("o_orderstatus") == "O", use_deletion_vectors=True
    )
    got = (
        spark.read.format("lance")
        .load(tmp_ds)
        .where(F.col("o_totalprice") > 100000.0)
        .count()
    )
    exp = orders.where(
        (F.col("o_orderstatus") != "O") & (F.col("o_totalprice") > 100000.0)
    ).count()
    assert got == exp


def test_deletion_vector_compact_materializes(spark, sf_dir, tmp_ds):
    """compact() rewrites deletion-vector fragments into clean files."""
    import pyarrow.compute as pc

    register(spark)
    supp = load(spark, sf_dir, "supplier")
    supp.repartition(4).write.format("lance").mode("overwrite").save(tmp_ds)
    cut = supp.agg(F.expr("percentile(s_suppkey, 0.3)")).collect()[0][0]
    lf.delete_where(
        tmp_ds, pc.field("s_suppkey") <= cut, use_deletion_vectors=True
    )
    n_live = spark.read.format("lance").load(tmp_ds).count()
    man = lf.compact(tmp_ds, target_rows=100_000_000)
    assert all(f.deletion_file is None for f in man.fragments)
    assert sum(f.num_rows for f in man.fragments) == n_live
    assert spark.read.format("lance").load(tmp_ds).count() == n_live


def test_deletion_vector_upsert_does_not_resurrect(spark, sf_dir, tmp_ds):
    """Upsert rewriting a fragment with a deletion vector must apply
    the vector (deleted rows stay deleted through the merge)."""
    import pyarrow.compute as pc

    from lance_duckdb_spark.sources.maintenance import upsert

    register(spark)
    cust = load(spark, sf_dir, "customer")
    cust.write.format("lance").mode("overwrite").save(tmp_ds)
    lf.delete_where(
        tmp_ds, pc.field("c_custkey") <= 40, use_deletion_vectors=True
    )
    upd = cust.where(
        (F.col("c_custkey") > 40) & (F.col("c_custkey") <= 80)
    ).withColumn("c_acctbal", F.col("c_acctbal") + F.lit(5.0))
    upsert(spark, tmp_ds, upd, key="c_custkey")
    # fresh load() per action: the Python-DS scan caches pushed
    # filters per relation (see LanceScanReader docstring)
    assert (
        spark.read.format("lance")
        .load(tmp_ds)
        .where(F.col("c_custkey") <= 40)
        .count()
        == 0
    )
    assert (
        spark.read.format("lance").load(tmp_ds).count()
        == cust.where(F.col("c_custkey") > 40).count()
    )


def test_zorder_write_prunes_2d_ranges(spark, sf_dir, tmp_ds):
    """Z-order clustering makes zone maps effective on BOTH
    dimensions of a 2-D range predicate; an append-ordered write of
    the same data prunes (almost) nothing."""
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        LessThanOrEqual,
    )

    from lance_duckdb_spark.sources.datasource import _fragment_may_match
    from lance_duckdb_spark.sources.layout import write_zordered

    register(spark)
    li = load(spark, sf_dir, "lineitem")
    write_zordered(
        li, tmp_ds, cols=("l_quantity", "l_extendedprice"), n_fragments=16
    )
    man = lf.read_manifest(tmp_ds)
    assert len(man.fragments) == 16

    filters = [
        GreaterThanOrEqual(("l_quantity",), 10),
        LessThanOrEqual(("l_quantity",), 20),
        GreaterThanOrEqual(("l_extendedprice",), 20000.0),
        LessThanOrEqual(("l_extendedprice",), 40000.0),
    ]
    kept = [f for f in man.fragments if _fragment_may_match(f, filters)]
    # the 2-D window is ~20% x ~20% of the space: clustered layout
    # must prune well over half the fragments
    assert len(kept) <= len(man.fragments) // 2, (
        f"z-order pruned only {len(man.fragments) - len(kept)} of "
        f"{len(man.fragments)} fragments"
    )

    # results are identical to the raw table (clustering is layout-only)
    got = (
        spark.read.format("lance")
        .load(tmp_ds)
        .where(
            (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
            & (F.col("l_extendedprice") >= 20000.0)
            & (F.col("l_extendedprice") <= 40000.0)
        )
        .count()
    )
    exp = li.where(
        (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
        & (F.col("l_extendedprice") >= 20000.0)
        & (F.col("l_extendedprice") <= 40000.0)
    ).count()
    assert got == exp


def test_merge_schema_append(spark, sf_dir, tmp_ds):
    """Schema evolution: append with a NEW column via mergeSchema;
    old fragments read the column as NULL, pushed filters on the
    evolved column keep exact NULL semantics, and appends that omit
    old columns null-fill symmetrically."""
    register(spark)
    nat = load(spark, sf_dir, "nation")
    nat.write.format("lance").mode("overwrite").save(tmp_ds)

    # without the option: rejected
    with pytest.raises(Exception, match="schema mismatch"):
        nat.withColumn("score", F.lit(1.5)).write.format("lance").mode(
            "append"
        ).save(tmp_ds)

    nat.withColumn("score", F.lit(1.5)).write.format("lance").mode(
        "append"
    ).option("mergeSchema", "true").save(tmp_ds)

    got = spark.read.format("lance").load(tmp_ds)
    assert got.schema.fieldNames() == nat.schema.fieldNames() + ["score"]
    assert got.count() == 2 * nat.count()
    # old fragment's rows surface NULL score
    assert (
        spark.read.format("lance")
        .load(tmp_ds)
        .where(F.col("score").isNull())
        .count()
        == nat.count()
    )
    # pushed value filter on the evolved column: only new rows match
    assert (
        spark.read.format("lance")
        .load(tmp_ds)
        .where(F.col("score") > 1.0)
        .count()
        == nat.count()
    )

    # append omitting an existing column: null-filled on read
    nat.drop("n_name").withColumn("score", F.lit(2.5)).write.format(
        "lance"
    ).mode("append").option("mergeSchema", "true").save(tmp_ds)
    assert (
        spark.read.format("lance")
        .load(tmp_ds)
        .where(F.col("n_name").isNull())
        .count()
        == nat.count()
    )

    # retyping an existing column: rejected even with mergeSchema
    with pytest.raises(Exception, match="cannot change existing field"):
        nat.withColumn(
            "n_regionkey", F.col("n_regionkey").cast("string")
        ).write.format("lance").mode("append").option(
            "mergeSchema", "true"
        ).save(tmp_ds)


def test_upsert_on_evolved_dataset_keeps_evolved_values(
    spark, sf_dir, tmp_ds
):
    """Regression (r4): upsert must read affected fragments with the
    COMMITTED schema, not one file's inferred footer — otherwise a
    mergeSchema-evolved column present only in newer fragments is
    silently dropped by the rewrite (data loss)."""
    from lance_duckdb_spark.sources.maintenance import upsert

    register(spark)
    nat = load(spark, sf_dir, "nation")
    nat.write.format("lance").mode("overwrite").save(tmp_ds)
    # evolve: second fragment carries a score column
    nat.withColumn("n_nationkey", F.col("n_nationkey") + 100).withColumn(
        "score", F.lit(1.5)
    ).write.format("lance").mode("append").option(
        "mergeSchema", "true"
    ).save(tmp_ds)

    # upsert touching BOTH fragments (keys 0 and 100)
    updates = (
        spark.read.format("lance")
        .load(tmp_ds)
        .where(F.col("n_nationkey").isin(0, 100))
        .withColumn("n_name", F.lit("UPDATED"))
    )
    upsert(spark, tmp_ds, updates, key="n_nationkey")

    # fresh load per action: the Python-DS relation caches the first
    # action's pushed filters (documented trap)
    def fresh():
        return spark.read.format("lance").load(tmp_ds)

    # evolved values survive the rewrite: all 25 shifted rows still
    # carry score 1.5, none were nulled by footer inference
    assert (
        fresh().where(F.col("score") == 1.5).count() == nat.count()
    ), "evolved column values lost in upsert rewrite"
    assert fresh().where(F.col("n_name") == "UPDATED").count() == 2
    assert fresh().count() == 2 * nat.count()


def test_compact_on_evolved_dataset(spark, sf_dir, tmp_ds):
    """Regression (r4): compact() must null-fill heterogeneous
    fragment schemas to the committed schema before concatenation —
    pa.concat_tables raises on an evolved dataset otherwise."""
    register(spark)
    nat = load(spark, sf_dir, "nation")
    nat.write.format("lance").mode("overwrite").save(tmp_ds)
    nat.withColumn("n_nationkey", F.col("n_nationkey") + 100).withColumn(
        "score", F.lit(2.0)
    ).write.format("lance").mode("append").option(
        "mergeSchema", "true"
    ).save(tmp_ds)

    man = lf.compact(tmp_ds, target_rows=10**9)  # force full rewrite
    assert len(man.fragments) == 1

    def fresh():
        return spark.read.format("lance").load(tmp_ds)

    assert fresh().count() == 2 * nat.count()
    # pre-evolution rows read NULL score, evolved rows keep 2.0
    assert fresh().where(F.col("score").isNull()).count() == nat.count()
    assert fresh().where(F.col("score") == 2.0).count() == nat.count()


def test_deletion_vector_empty_fragment_keeps_stream_offsets(
    spark, sf_dir, tmp_ds
):
    """Regression (r4): a deletion-vector delete that empties a
    fragment keeps the fragment IN the manifest (live_rows == 0) so
    the stream source's fragment-prefix offsets stay stable; scans
    see zero rows from it and compact() drops it later."""
    import pyarrow.compute as pc

    register(spark)
    nat = load(spark, sf_dir, "nation")
    nat.write.format("lance").mode("overwrite").save(tmp_ds)
    nat.withColumn("n_nationkey", F.col("n_nationkey") + 100).write.format(
        "lance"
    ).mode("append").save(tmp_ds)
    files_before = [f.file for f in lf.read_manifest(tmp_ds).fragments]

    # empty the SECOND fragment entirely via a deletion vector
    lf.delete_where(
        tmp_ds, pc.field("n_nationkey") >= 100, use_deletion_vectors=True
    )
    man = lf.read_manifest(tmp_ds)
    assert [f.file for f in man.fragments] == files_before, (
        "fragment list changed shape: running streams would die"
    )
    emptied = man.fragments[-1]
    assert emptied.live_rows == 0 and emptied.deletion_file is not None
    assert spark.read.format("lance").load(tmp_ds).count() == nat.count()
    assert (
        spark.read.format("lance")
        .load(tmp_ds)
        .where(F.col("n_nationkey") >= 100)
        .count()
        == 0
    )

    # compact materializes and drops the empty fragment
    man2 = lf.compact(tmp_ds, target_rows=10**9)
    assert all(f.deletion_file is None for f in man2.fragments)
    assert (
        spark.read.format("lance").load(tmp_ds).count() == nat.count()
    )


def test_cleanup_old_versions_retention(spark, sf_dir, tmp_path):
    """Vacuum: kept versions stay readable (incl. their deletion
    vectors and blooms), vacuumed versions fail loudly, orphaned
    files are actually removed, bytes are reclaimed."""
    import pyarrow.compute as pc

    from lance_duckdb_spark.sources import lance_format as lf
    from lance_duckdb_spark.sources.datasource import register

    register(spark)
    root = str(tmp_path / "vac.lance")
    docs = load(spark, sf_dir, "documents")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.format(
        "lance"
    ).option("bloom_columns", "source").mode("overwrite").save(root)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.format(
        "lance"
    ).option("bloom_columns", "source").mode("append").save(root)
    lf.delete_where(root, pc.field("doc_id") < 10, use_deletion_vectors=True)
    assert lf.list_versions(root) == [1, 2, 3]

    before = docs.where(F.col("doc_id") >= 10).count()
    stats = lf.cleanup_old_versions(root, keep_last=2, older_than_seconds=0)
    assert lf.list_versions(root) == [2, 3]
    assert stats["versions_removed"] == 1
    # v1/v2 share fragments with v3 (delete was metadata-only), so
    # nothing is orphaned yet — referenced files must all survive
    assert stats["files_removed"] == 0
    assert spark.read.format("lance").load(root).count() == before
    # kept old version still time-travels
    assert (
        spark.read.format("lance").option("version", 2).load(root).count()
        > before
    )
    # vacuumed version is gone
    with pytest.raises(Exception, match="version 1 not found"):
        lf.read_manifest(root, 1)

    # now force an orphan: rewriting compact, then vacuum to head only
    from lance_duckdb_spark.sources.lance_format import compact

    compact(root)
    # a fresh unreferenced file inside the default grace window must
    # survive (in-flight writer protection)
    guard = lf.cleanup_old_versions(root, keep_last=1)
    assert guard["files_removed"] == 0
    stats2 = lf.cleanup_old_versions(root, keep_last=1, older_than_seconds=0)
    assert stats2["files_removed"] > 0
    assert stats2["bytes_reclaimed"] > 0
    assert spark.read.format("lance").load(root).count() == before


def test_optimize_zorder_in_place(spark, sf_dir, tmp_path):
    """OPTIMIZE ZORDER on an existing append-ordered dataset: results
    unchanged, 2-D range scans plan fewer fragments afterward, the
    pre-optimize version still time-travels, vacuum reclaims it."""
    from lance_duckdb_spark.sources import lance_format as lf
    from lance_duckdb_spark.sources.datasource import register
    from lance_duckdb_spark.sources.layout import optimize

    register(spark)
    root = str(tmp_path / "opt.lance")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    # append-ordered: every fragment spans the full 2-D value space
    li.repartition(16).write.format("lance").mode("overwrite").save(root)

    def planned_fragments():
        from lance_duckdb_spark.sources.datasource import (
            GreaterThanOrEqual,
            LanceScanReader,
            LessThanOrEqual,
        )
        from pyspark.sql.types import StructType

        import json as _json

        man = lf.read_manifest(root)
        schema = StructType.fromJson(_json.loads(man.schema_json))
        r = LanceScanReader(root, schema, None)
        r.pushed = [
            GreaterThanOrEqual(("l_quantity",), 10.0),
            LessThanOrEqual(("l_quantity",), 20.0),
            GreaterThanOrEqual(("l_extendedprice",), 20000.0),
            LessThanOrEqual(("l_extendedprice",), 40000.0),
        ]
        return len(r.partitions())

    pred = (
        (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
        & (F.col("l_extendedprice") >= 20000.0)
        & (F.col("l_extendedprice") <= 40000.0)
    )
    before_frags = planned_fragments()
    before_rows = sorted(
        r.l_orderkey
        for r in spark.read.format("lance").load(root).where(pred).collect()
    )
    v1 = lf.read_manifest(root).version

    optimize(spark, root, zorder_cols=("l_quantity", "l_extendedprice"))

    after_frags = planned_fragments()
    after_rows = sorted(
        r.l_orderkey
        for r in spark.read.format("lance").load(root).where(pred).collect()
    )
    assert after_rows == before_rows  # layout never changes answers
    assert after_frags < before_frags  # pruning now effective
    # pre-optimize version still readable ...
    n_v1 = (
        spark.read.format("lance").option("version", str(v1)).load(root).count()
    )
    assert n_v1 == load(spark, sf_dir, "lineitem").count()
    # ... until vacuumed
    stats = lf.cleanup_old_versions(root, keep_last=1, older_than_seconds=0)
    assert stats["files_removed"] > 0


def test_two_writer_concurrent_appends_lose_nothing(spark, tmp_path):
    """Multi-writer commit protocol: two writers committing the next
    version at the same moment must BOTH land (one wins the
    exclusive-create, the loser rebases onto the new head and
    retries) with no lost fragments; a stale-expectation maintenance
    rewrite refuses; and vacuum's default grace window protects the
    young files either writer may still be staging."""
    import threading

    import pyarrow as pa

    from lance_duckdb_spark.sources import lance_format as lf
    from lance_duckdb_spark.sources.datasource import register as _reg

    _reg(spark)
    root = str(tmp_path / "mw.lance")
    schema_json = (
        '{"type":"struct","fields":[{"name":"x","type":"long",'
        '"nullable":true,"metadata":{}}]}'
    )
    lf.commit(
        root, schema_json,
        [lf.write_fragment(root, pa.table({"x": [0]}))], "overwrite",
    )
    barrier = threading.Barrier(2)
    errs: list[Exception] = []

    def writer(vals):
        try:
            frag = lf.write_fragment(root, pa.table({"x": vals}))
            barrier.wait()  # maximize commit contention
            lf.commit(root, schema_json, [frag], "append")
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    ts = [
        threading.Thread(target=writer, args=([1, 2],)),
        threading.Thread(target=writer, args=([3, 4],)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    assert lf.list_versions(root) == [1, 2, 3]  # both commits landed
    head = spark.read.format("lance").load(root)
    assert sorted(r.x for r in head.collect()) == [0, 1, 2, 3, 4]

    # rewrite-vs-append conflict: a maintenance op that read version
    # 1 must refuse once the appends advanced the head
    with pytest.raises(lf.LanceDatasetError, match="concurrent commit"):
        lf.commit(
            root, schema_json,
            [lf.write_fragment(root, pa.table({"x": [9]}))],
            "overwrite", expected_version=1,
        )

    # orphan the old fragments, then vacuum: the default grace
    # window refuses to reclaim young files (an in-flight writer may
    # reference them); an explicit zero grace reclaims
    lf.commit(
        root, schema_json,
        [lf.write_fragment(root, pa.table({"x": [100]}))], "overwrite",
    )
    grace = lf.cleanup_old_versions(root, keep_last=1)
    assert grace["files_removed"] == 0
    forced = lf.cleanup_old_versions(root, keep_last=1, older_than_seconds=0)
    assert forced["files_removed"] >= 3
    assert [r.x for r in spark.read.format("lance").load(root).collect()] == [100]


def test_begin_version_refuses_deletion_vector_deletes(spark, tmp_path):
    """CDC reads must fail loudly when a deletion-vector delete ran
    inside the window: the fragment FILE survives but its rows
    changed, so a name-only diff would silently omit the deleted
    rows (r5 review finding)."""
    import pyarrow.compute as pc

    from lance_duckdb_spark.sources import lance_format as lf
    from lance_duckdb_spark.sources.datasource import register as _reg

    _reg(spark)
    root = str(tmp_path / "cdc.lance")
    df = spark.range(10).withColumnRenamed("id", "x")
    df.coalesce(1).write.format("lance").mode("overwrite").save(root)
    lf.delete_where(root, pc.field("x") < 3, use_deletion_vectors=True)
    df.selectExpr("x + 100 AS x").coalesce(1).write.format("lance").mode(
        "append"
    ).save(root)
    with pytest.raises(Exception, match="append-only"):
        spark.read.format("lance").option("begin_version", "1").load(
            root
        ).collect()


def test_delete_where_works_on_schema_evolved_dataset(spark, tmp_path):
    """A delete predicate on an evolved column must KEEP pre-evolution
    rows (NULL predicate = keep, SQL DELETE semantics) instead of
    crashing on the missing field (r5 review finding) — both the
    rewrite and deletion-vector paths."""
    import pyarrow.compute as pc

    from lance_duckdb_spark.sources import lance_format as lf
    from lance_duckdb_spark.sources.datasource import register as _reg

    _reg(spark)
    for dv in (False, True):
        root = str(tmp_path / f"evo{dv}.lance")
        spark.range(5).withColumnRenamed("id", "a").coalesce(1).write.format(
            "lance"
        ).mode("overwrite").save(root)
        spark.range(5).selectExpr("id + 10 AS a", "id AS c").coalesce(
            1
        ).write.format("lance").mode("append").option(
            "mergeSchema", "true"
        ).save(root)
        lf.delete_where(root, pc.field("c") >= 3, use_deletion_vectors=dv)
        got = sorted(
            r.a for r in spark.read.format("lance").load(root).collect()
        )
        # old fragment (c NULL) fully kept; new fragment keeps c<3
        assert got == [0, 1, 2, 3, 4, 10, 11, 12], (dv, got)


def test_scan_reader_pickles_without_manifest(spark, sf_dir, tmp_path):
    """The executor-side pickle of the reader must not carry the full
    manifest (fragment list + zone maps — driver-only planning
    state; r5 review finding)."""
    import pickle

    from lance_duckdb_spark.sources.datasource import LanceScanReader
    from lance_duckdb_spark.sources.datasource import register as _reg

    _reg(spark)
    root = str(tmp_path / "p.lance")
    load(spark, sf_dir, "nation").write.format("lance").mode(
        "overwrite"
    ).save(root)
    r = LanceScanReader(root, load(spark, sf_dir, "nation").schema, None)
    clone = pickle.loads(pickle.dumps(r))
    assert clone.manifest is None
    assert clone.schema is not None


def test_compact_preserves_bloom_columns(spark, sf_dir, tmp_path):
    """Maintenance rewrites must re-record bloom side files for the
    columns the source fragments bloomed, or point-probe pruning
    silently regresses after every compaction (r5 review finding)."""
    from lance_duckdb_spark.sources import lance_format as lf
    from lance_duckdb_spark.sources.datasource import register as _reg

    _reg(spark)
    root = str(tmp_path / "bl.lance")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    docs.repartition(4).write.format("lance").mode("overwrite").option(
        "bloom_columns", "doc_id"
    ).save(root)
    assert all(f.bloom_file for f in lf.read_manifest(root).fragments)
    lf.compact(root, target_rows=10**9)  # everything rewritten
    frags = lf.read_manifest(root).fragments
    assert frags and all(f.bloom_file for f in frags)


def test_stream_complete_mode_overwrites_per_epoch(spark, sf_dir, tmp_path):
    """outputMode('complete') must REPLACE the previous epoch's
    result, not append another copy (r5 review finding: the
    overwrite flag was dropped)."""
    from lance_duckdb_spark.sources.datasource import register as _reg
    from lance_duckdb_spark.tables import load as _load

    _reg(spark)
    src = str(tmp_path / "src.lance")
    sink = str(tmp_path / "sink.lance")
    ev = _load(spark, sf_dir, "events").limit(300).cache()
    n_types = ev.select("event_type").distinct().count()
    thirds = [ev.where(F.col("event_id") % 3 == i) for i in range(3)]
    thirds[0].coalesce(1).write.format("lance").mode("overwrite").save(src)
    for i in (1, 2):
        thirds[i].coalesce(1).write.format("lance").mode("append").save(src)
        q = (
            spark.readStream.format("lance")
            .load(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("lance")
            .outputMode("complete")
            .option("checkpointLocation", src + ".ckpt")
            .option("path", sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    out = spark.read.format("lance").load(sink)
    assert out.count() == n_types  # one row per group, not per epoch
    total = out.agg(F.sum("n")).first()[0]
    assert total == ev.count()


def test_nan_equality_filter_not_consumed_by_pushdown(spark, tmp_path):
    """Spark SQL's EqualTo treats NaN = NaN as TRUE; pyarrow compares
    IEEE (always false). A NaN-operand filter must be yielded back to
    Spark, never fully consumed by the source (r8 review finding)."""
    import math

    from pyspark.sql import functions as F

    from lance_duckdb_spark.sources.datasource import register

    register(spark)
    path = str(tmp_path / "nan.lance")
    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, 2.5), (4, float("nan"))],
        "id long, d double",
    )
    df.write.format("lance").mode("overwrite").save(path)
    back = spark.read.format("lance").load(path)
    hits = back.where(
        F.col("d") == F.lit(float("nan")).cast("double")
    ).collect()
    assert sorted(r["id"] for r in hits) == [2, 4]
    assert all(math.isnan(r["d"]) for r in hits)
    # In-list containing NaN: same semantics
    hits_in = back.where(
        F.col("d").isin([float("nan"), 1.5])
    ).collect()
    assert sorted(r["id"] for r in hits_in) == [1, 2, 4]


def test_sql_ddl_temp_view_using_lance(spark, sf_dir, tmp_ds):
    """Pure-SQL DDL route (r10): `CREATE TEMPORARY VIEW ... USING
    lance OPTIONS (...)` reaches the Python DS with its options
    intact, so users get a no-Python "attach" verb. The recommended
    form sets filterPushdown 'false' (the long-lived-view relation-
    cloning rule README documents for register_lance_views); the
    version option time-travels. Persistent `CREATE TABLE ... USING
    lance` stays refused by Spark itself — the catalog hands Python
    sources EMPTY options (re-verified on Spark 4.1: the reader
    raises `'path' is required (options: [])`), which is the
    documented catalog limitation, not ours."""
    register(spark)
    orders = load(spark, sf_dir, "orders")
    half = orders.where(F.col("o_orderkey") % 2 == 0)
    half.write.format("lance").mode("overwrite").save(tmp_ds)
    orders.where(F.col("o_orderkey") % 2 == 1).write.format(
        "lance"
    ).mode("append").save(tmp_ds)

    spark.sql(
        f"""CREATE OR REPLACE TEMPORARY VIEW orders_ddl USING lance
        OPTIONS (path '{tmp_ds}', filterPushdown 'false')"""
    )
    try:
        assert (
            spark.sql("SELECT COUNT(*) AS n FROM orders_ddl").collect()[0].n
            == orders.count()
        )
        # predicate + projection still correct with pushdown declined
        got = spark.sql(
            "SELECT o_orderkey FROM orders_ddl WHERE o_orderkey % 1000 = 7"
        ).collect()
        want = orders.where(F.col("o_orderkey") % 1000 == 7).collect()
        assert sorted(r.o_orderkey for r in got) == sorted(
            r.o_orderkey for r in want
        )
        # version option = SQL time travel
        spark.sql(
            f"""CREATE OR REPLACE TEMPORARY VIEW orders_v1 USING lance
            OPTIONS (path '{tmp_ds}', version '1',
                     filterPushdown 'false')"""
        )
        assert (
            spark.sql("SELECT COUNT(*) AS n FROM orders_v1").collect()[0].n
            == half.count()
        )
    finally:
        spark.catalog.dropTempView("orders_ddl")
        spark.catalog.dropTempView("orders_v1")


def test_version_changes_cdc(spark, sf_dir, tmp_path):
    """Full CDC between versions (operators/lance_ops.version_changes):
    mask-deletes are row-exact; appended fragments are inserts; a
    REWRITE surfaces as fragment-level delete+insert pairs (file-CDF
    granularity); the no-change window is empty."""
    from pyspark.sql import functions as F

    from lance_duckdb_spark.catalog import lance_sql
    from lance_duckdb_spark.operators.lance_ops import version_changes

    register(spark)
    root = str(tmp_path / "cdc.lance")
    load(spark, sf_dir, "nation").write.format("lance").mode(
        "overwrite"
    ).save(root)
    lance_sql(spark, f"DELETE FROM '{root}' WHERE n_nationkey < 3").collect()
    lance_sql(
        spark,
        f"INSERT INTO '{root}' VALUES (CAST(90 AS INT), 'x', CAST(0 AS INT))",
    ).collect()
    ch = version_changes(spark, root, 1, 3)
    by = {
        (r["_change_type"], r["n_nationkey"]) for r in ch.collect()
    }
    assert by == {("delete", 0), ("delete", 1), ("delete", 2), ("insert", 90)}
    # identical-version window: no changes
    assert version_changes(spark, root, 3, 3).count() == 0
    # a rewrite (UPDATE) surfaces as delete+insert of the rewritten
    # fragment's rows — file-CDF granularity, counts must balance
    lance_sql(
        spark,
        f"UPDATE '{root}' SET n_name = upper(n_name) "
        f"WHERE n_nationkey = 5",
    ).collect()
    ch2 = version_changes(spark, root, 3, 4)
    counts = {
        r["_change_type"]: r["n"]
        for r in ch2.groupBy("_change_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert counts["insert"] == counts["delete"] > 0
    # the updated value is in the insert side, the old one in delete
    ins = {
        r["n_name"]
        for r in ch2.where(
            (F.col("_change_type") == "insert")
            & (F.col("n_nationkey") == 5)
        ).collect()
    }
    assert all(n == n.upper() for n in ins)


def test_append_compatible_nested_nullability():
    """Narrow-only nullability must hold RECURSIVELY: array
    elements, struct members, and map values — not just top-level
    fields (r11 advice: nested widening slipped through and could
    plant NULLs a committed non-null nested slot forbids)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    def j(st):
        return json.dumps(st.jsonValue())

    def arr(contains_null):
        return StructType(
            [
                StructField(
                    "a", ArrayType(IntegerType(), contains_null), True
                )
            ]
        )

    # identical OK; element narrowing OK; element widening refused
    assert lf._append_compatible(j(arr(False)), j(arr(False)))
    assert lf._append_compatible(j(arr(True)), j(arr(False)))
    assert not lf._append_compatible(j(arr(False)), j(arr(True)))

    def nested(member_nullable):
        inner = StructType(
            [StructField("x", StringType(), member_nullable)]
        )
        return StructType([StructField("s", inner, True)])

    assert lf._append_compatible(j(nested(True)), j(nested(False)))
    assert not lf._append_compatible(j(nested(False)), j(nested(True)))

    def mp(value_contains_null):
        return StructType(
            [
                StructField(
                    "m",
                    MapType(
                        StringType(), IntegerType(), value_contains_null
                    ),
                    True,
                )
            ]
        )

    assert lf._append_compatible(j(mp(True)), j(mp(False)))
    assert not lf._append_compatible(j(mp(False)), j(mp(True)))

    # deep: array<struct<x>> with the struct member widening
    def deep(member_nullable):
        inner = StructType(
            [StructField("x", StringType(), member_nullable)]
        )
        return StructType(
            [StructField("a", ArrayType(inner, True), True)]
        )

    assert lf._append_compatible(j(deep(True)), j(deep(False)))
    assert not lf._append_compatible(j(deep(False)), j(deep(True)))
    # shape changes still refused outright
    other = StructType([StructField("b", IntegerType(), True)])
    assert not lf._append_compatible(j(arr(True)), j(other))
