"""take_rows (operators/lance_ops.py): positional fetch equals the
manifest-order full scan at the same positions, only hit fragments
become tasks, deletion vectors remap logical positions onto live
rows, bad indices are loud.
Oracle equality of the lance_take driver query is covered by
test_correctness.py."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.operators.lance_ops import take_rows
from lance_duckdb_spark.sources import lance_format as lf
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.tables import load


@pytest.fixture(scope="module")
def multi_frag_root(spark, sf_dir, tmp_path_factory):
    register(spark)
    root = str(tmp_path_factory.mktemp("take") / "orders.lance")
    load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    ).repartition(4).write.format("lance").mode("overwrite").save(root)
    return root


def _manifest_order_rows(root):
    man = lf.read_manifest(root)
    rows = []
    for frag in man.fragments:
        t = pq.read_table(os.path.join(root, frag.file))
        rows.extend(t.to_pylist())
    return rows


def test_take_matches_manifest_order(spark, multi_frag_root):
    all_rows = _manifest_order_rows(multi_frag_root)
    n = len(all_rows)
    idx = [0, 1, n // 2, n - 1]
    got = take_rows(spark, multi_frag_root, idx).collect()
    want = [all_rows[i] for i in idx]
    assert sorted(
        (r["o_orderkey"], r["o_custkey"]) for r in got
    ) == sorted((r["o_orderkey"], r["o_custkey"]) for r in want)


def test_take_prunes_to_hit_fragments(spark, multi_frag_root):
    """Positions inside the FIRST fragment only: the task relation
    must hold one row (one fragment read), not four."""
    man = lf.read_manifest(multi_frag_root)
    assert len(man.fragments) == 4
    first_rows = man.fragments[0].num_rows
    idx = [0, 1, first_rows - 1]
    got = take_rows(spark, multi_frag_root, idx, columns=["o_orderkey"])
    assert got.count() == len(set(idx))
    # re-derive the driver-side CUMULATIVE mapping the same way the
    # function does and pin that only one fragment is hit
    hits, start = [], 0
    for f in man.fragments:
        end = start + f.num_rows
        if any(start <= i < end for i in idx):
            hits.append(f.file)
        start = end
    assert len(hits) == 1


def test_take_refuses_out_of_range_and_unknown_columns(
    spark, multi_frag_root
):
    n = sum(f.num_rows for f in lf.read_manifest(multi_frag_root).fragments)
    with pytest.raises(lf.LanceDatasetError, match="out of range"):
        take_rows(spark, multi_frag_root, [n])
    with pytest.raises(lf.LanceDatasetError, match="unknown columns"):
        take_rows(spark, multi_frag_root, [0], columns=["nope"])


def test_take_addresses_live_positions(spark, sf_dir, tmp_path):
    """Indices address LOGICAL (live) positions: rows masked by
    deletion vectors don't count (Lance Dataset::take semantics).
    Verified against the full live manifest-order row list with dels
    in the middle of the single fragment."""
    from lance_duckdb_spark.catalog import lance_sql

    register(spark)
    root = str(tmp_path / "takedel.lance")
    load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).coalesce(1).write.format("lance").mode("overwrite").save(root)
    lance_sql(spark, f"DELETE FROM '{root}' WHERE o_orderkey % 5 = 1")
    man = lf.read_manifest(root)
    assert man.fragments[0].deletion_file is not None
    dels = set(lf.read_deletion_positions(root, man.fragments[0]))
    t = pq.read_table(os.path.join(root, man.fragments[0].file))
    live = [r for i, r in enumerate(t.to_pylist()) if i not in dels]
    idx = [0, 1, 7, len(live) // 2, len(live) - 1]
    got = take_rows(spark, root, idx, columns=["o_orderkey"]).collect()
    assert sorted(r["o_orderkey"] for r in got) == sorted(
        live[i]["o_orderkey"] for i in idx
    )
    # out-of-range is judged against LIVE rows, not physical
    with pytest.raises(lf.LanceDatasetError, match="out of range"):
        take_rows(spark, root, [len(live)])


def test_take_dv_remap_never_reads_deletions_on_driver(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The live->physical remap runs INSIDE the fragment task (r11 —
    the r10 verdict's documented driver bound): driver cost is
    manifest arithmetic only. Asserted by poisoning the DRIVER's
    deletion-file reader — workers are separate processes, so the
    take still succeeds iff the driver never walks a deletion list."""
    from lance_duckdb_spark.catalog import lance_sql

    register(spark)
    root = str(tmp_path / "takedrv.lance")
    load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).coalesce(1).write.format("lance").mode("overwrite").save(root)
    lance_sql(spark, f"DELETE FROM '{root}' WHERE o_orderkey % 5 = 1")
    man = lf.read_manifest(root)
    assert man.fragments[0].deletion_file is not None
    dels = set(lf.read_deletion_positions(root, man.fragments[0]))
    t = pq.read_table(os.path.join(root, man.fragments[0].file))
    live = [r for i, r in enumerate(t.to_pylist()) if i not in dels]

    def _poisoned(*a, **k):  # pragma: no cover - must not run
        raise AssertionError(
            "take_rows read a deletion file on the DRIVER"
        )

    monkeypatch.setattr(lf, "read_deletion_positions", _poisoned)
    idx = [0, 3, len(live) // 2, len(live) - 1]
    got = take_rows(spark, root, idx, columns=["o_orderkey"]).collect()
    assert sorted(r["o_orderkey"] for r in got) == sorted(
        live[i]["o_orderkey"] for i in idx
    )


def test_take_dv_prefix_shifts_later_fragments(spark, sf_dir, tmp_path):
    """A dv on an EARLIER fragment shifts every later logical
    position: position (live rows of fragment 0) + k must land on
    fragment 1's k-th live row."""
    from lance_duckdb_spark.catalog import lance_sql

    register(spark)
    root = str(tmp_path / "takedel2.lance")
    df = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    df.coalesce(1).write.format("lance").mode("overwrite").save(root)
    # fragment 1: keys shifted out of the delete predicate's range
    df.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    ).coalesce(1).write.format("lance").mode("append").save(root)
    lance_sql(
        spark,
        f"DELETE FROM '{root}' WHERE o_orderkey % 3 = 1"
        f" AND o_orderkey < 10000000",
    )
    man = lf.read_manifest(root)
    assert man.fragments[0].deletion_file is not None
    assert man.fragments[1].deletion_file is None
    live0 = man.fragments[0].num_rows - man.fragments[0].num_deleted
    got = take_rows(
        spark, root, [live0, live0 + 5], columns=["o_orderkey"]
    ).collect()
    frag1 = pq.read_table(
        os.path.join(root, man.fragments[1].file), columns=["o_orderkey"]
    )
    want = {frag1["o_orderkey"][0].as_py(), frag1["o_orderkey"][5].as_py()}
    assert {r["o_orderkey"] for r in got} == want


def test_take_allows_dv_after_last_hit(spark, sf_dir, tmp_path):
    """Fragment layout [clean, dv]: positions entirely inside the clean
    first fragment are unaffected by the later dv and must succeed."""
    import pyarrow.parquet as _pq

    register(spark)
    root = str(tmp_path / "takedel3.lance")
    df = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    # fragment 0: keys shifted out of the delete predicate's range
    df.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    ).coalesce(1).write.format("lance").mode("overwrite").save(root)
    # fragment 1: original keys (contains o_orderkey == 1)
    df.coalesce(1).write.format("lance").mode("append").save(root)
    import pyarrow.compute as pc

    lf.delete_where(
        root, pc.field("o_orderkey") == 1, use_deletion_vectors=True
    )
    man = lf.read_manifest(root)
    assert man.fragments[0].deletion_file is None
    assert man.fragments[1].deletion_file is not None
    got = take_rows(spark, root, [0, 3], columns=["o_orderkey"]).collect()
    frag0 = _pq.read_table(
        os.path.join(root, man.fragments[0].file), columns=["o_orderkey"]
    )
    want = {frag0["o_orderkey"][0].as_py(), frag0["o_orderkey"][3].as_py()}
    assert {r["o_orderkey"] for r in got} == want
