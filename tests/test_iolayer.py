"""Object-store-ready IO layer (r12 — VERDICT item 1): a dataset
root can be a URI. These tests run the connector's write / scan /
DML / CDC / take / vacuum paths with the root on the ``mem://``
object-store backend — an op surface with NO rename/link/posix-open
(see sources/iolayer.py). Anything still hitting the root with raw
POSIX calls fails loudly here (no local path ``mem://...`` exists),
so green tests are a proof that every byte of dataset IO flows
through the six object-store verbs — the property an s3:// backend
needs. Reference behavior matched: the lance crate's object-store-
backed Dataset::open/write (rust/lib.rs:26-51, 341-393)."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.catalog import lance_sql
from lance_duckdb_spark.sources import iolayer as iol
from lance_duckdb_spark.sources import lance_format as lf
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.tables import load


# Parametrized over BOTH object-store backends (r13, r12 VERDICT
# item 5): mem:// (the op-surface simulator) and pafs:// (the same
# six verbs served through pyarrow.fs — a real client library, the
# S3FileSystem stand-in), so every connector IO path runs against a
# genuinely non-POSIX client too.
@pytest.fixture(params=["mem", "pafs"])
def mem_root(request):
    bucket = f"{request.param}://t-{uuid.uuid4().hex[:12]}"
    yield f"{bucket}/ds.lance"
    shutil.rmtree(iol.local_path(bucket), ignore_errors=True)


def _nation_target(spark, sf_dir, root):
    register(spark)
    load(spark, sf_dir, "nation").write.format("lance").mode(
        "overwrite"
    ).save(root)


def _state(spark, root):
    return {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in spark.read.format("lance").load(root).collect()
    }


def test_mem_root_is_not_a_local_path():
    # the enforcement premise: raw POSIX on the URI root must fail
    assert not os.path.isdir("mem://nope/ds.lance")
    with pytest.raises(OSError):
        open("mem://nope/ds.lance/_versions/1.manifest")


def test_mem_write_scan_roundtrip(spark, sf_dir, mem_root):
    """lance_roundtrip's path: writer fragments + manifest commit +
    full scan, root on the object store."""
    register(spark)
    src = load(spark, sf_dir, "customer")
    src.write.format("lance").mode("overwrite").save(mem_root)
    back = spark.read.format("lance").load(mem_root)
    assert back.count() == src.count()
    a = {r["c_custkey"] for r in src.select("c_custkey").collect()}
    b = {r["c_custkey"] for r in back.select("c_custkey").collect()}
    assert a == b
    # pushdown path reads through the layer too
    n = back.where(F.col("c_custkey") < 100).count()
    m = src.where(F.col("c_custkey") < 100).count()
    assert n == m
    # append makes version 2; time travel reads version 1
    src.limit(5).write.format("lance").mode("append").save(mem_root)
    assert (
        spark.read.format("lance").load(mem_root).count()
        == src.count() + 5
    )
    assert (
        spark.read.format("lance")
        .option("version", 1)
        .load(mem_root)
        .count()
        == src.count()
    )


def test_mem_sql_delete_and_take_dv(spark, sf_dir, mem_root):
    """lance_sql_delete + lance_take_dv's paths: executor-side
    deletion-mask writes, worker-side mask reads, positional take
    over the masked dataset — all on the object store."""
    from lance_duckdb_spark.operators.lance_ops import take_rows

    _nation_target(spark, sf_dir, mem_root)
    before = _state(spark, mem_root)
    out = lance_sql(
        spark,
        f"DELETE FROM '{mem_root}' WHERE n_nationkey % 5 = 0",
    ).collect()
    dropped = {k for k in before if k % 5 == 0}
    assert out[0]["rows_deleted"] == len(dropped)
    after = _state(spark, mem_root)
    assert set(after) == set(before) - dropped
    # second delete exercises the in-task mask MERGE path
    out = lance_sql(
        spark, f"DELETE FROM '{mem_root}' WHERE n_nationkey = 1"
    ).collect()
    assert out[0]["rows_deleted"] == 1
    live = sorted(set(before) - dropped - {1})
    # take by LOGICAL (live) position over the deletion-vector layout
    got = take_rows(spark, mem_root, [0, 1, len(live) - 1]).collect()
    taken = sorted(r["n_nationkey"] for r in got)
    # single-fragment nation written sorted by key? not guaranteed —
    # compare against the live view's physical order instead
    view = [
        r["n_nationkey"]
        for r in spark.read.format("lance").load(mem_root).collect()
    ]
    assert taken == sorted([view[0], view[1], view[len(live) - 1]])


def test_mem_merge_and_insert(spark, sf_dir, mem_root):
    """lance_merge's path: parquet DML staging promoted object-by-
    object into the store, one atomic commit; INSERT INTO appends."""
    _nation_target(spark, sf_dir, mem_root)
    before = _state(spark, mem_root)
    out = lance_sql(
        spark,
        f"MERGE INTO '{mem_root}' t USING ("
        f"  SELECT n_nationkey, upper(n_name) AS n_name, n_regionkey"
        f"  FROM '{mem_root}' WHERE n_nationkey % 2 = 0"
        f"  UNION ALL"
        f"  SELECT CAST(n_nationkey + 100 AS INT), n_name, n_regionkey"
        f"  FROM '{mem_root}' WHERE n_nationkey < 3"
        f") s ON t.n_nationkey = s.n_nationkey"
        f" WHEN MATCHED THEN UPDATE SET *"
        f" WHEN NOT MATCHED THEN INSERT *",
    ).collect()
    n_even = sum(1 for k in before if k % 2 == 0)
    assert [tuple(out[0])] == [(n_even, 3, 0)]
    after = _state(spark, mem_root)
    assert len(after) == len(before) + 3
    for k, (name, reg) in before.items():
        assert after[k] == ((name.upper(), reg) if k % 2 == 0 else (name, reg))
    out = lance_sql(
        spark,
        f"INSERT INTO '{mem_root}' VALUES "
        f"(CAST(900 AS INT), 'NOWHERE', CAST(0 AS INT))",
    ).collect()
    assert out[0]["rows_inserted"] == 1
    assert _state(spark, mem_root)[900] == ("NOWHERE", 0)


def test_mem_copy_to_and_cdc(spark, sf_dir, mem_root):
    """lance_sql_copy + lance_cdc_deletes' paths on the store."""
    from lance_duckdb_spark.operators.lance_ops import version_changes

    register(spark)
    region = load(spark, sf_dir, "region")
    region.createOrReplaceTempView("__iol_region")
    out = lance_sql(
        spark,
        f"COPY (SELECT * FROM __iol_region) TO '{mem_root}' "
        f"(FORMAT LANCE, MODE 'overwrite')",
    ).collect()
    assert out[0]["rows_copied"] == region.count()
    v1 = lf.read_manifest(mem_root).version
    region.limit(2).write.format("lance").mode("append").save(mem_root)
    lance_sql(spark, f"DELETE FROM '{mem_root}' WHERE r_regionkey = 3")
    v3 = lf.read_manifest(mem_root).version
    changes = version_changes(spark, mem_root, v1, v3).collect()
    kinds = sorted(r["_change_type"] for r in changes)
    # 2 appended inserts + deletes of every r_regionkey=3 row
    # (the original plus the appended copy if regionkey 3 was in it)
    n_del = sum(1 for k in kinds if k == "delete")
    assert kinds.count("insert") == 2
    assert n_del >= 1
    spark.catalog.dropTempView("__iol_region")


def test_mem_vacuum_and_commit_cas(spark, sf_dir, mem_root):
    """Version retention over LIST + last-modified, and the
    conditional-PUT commit CAS (expected_version refusal)."""
    _nation_target(spark, sf_dir, mem_root)
    load(spark, sf_dir, "nation").limit(3).write.format("lance").mode(
        "append"
    ).save(mem_root)
    man = lf.read_manifest(mem_root)
    assert man.version == 2
    res = lf.cleanup_old_versions(
        mem_root, keep_last=1, older_than_seconds=0.0
    )
    assert res["versions_removed"] == 1
    assert lf.list_versions(mem_root) == [2]
    # reads still serve the head
    assert len(_state(spark, mem_root)) > 0
    # CAS: committing against a stale expected_version must refuse
    with pytest.raises(lf.LanceDatasetError, match="concurrent commit"):
        lf.commit(
            mem_root,
            man.schema_json,
            [],
            mode="overwrite",
            expected_version=man.version - 1,
        )
    # put_if_absent: the loser of a same-key race gets False
    key = f"{mem_root}/_versions/999.manifest"
    assert iol.put_if_absent(key, b"{}") is True
    assert iol.put_if_absent(key, b"{}") is False
    iol.remove(key)


def test_mem_index_stores(spark, sf_dir, mem_root):
    """The index family on an object-store root (r12 extension of
    the storage contract): IVF build + partition-pruned ANN search,
    scalar-index build + pruned scan, FTS build + BM25 search — all
    with the dataset root AND the index/store dirs on ``mem://``.
    Python-side meta/locks/reclaims flow through the six verbs
    (conditional-create lock = the manifest CAS primitive); the
    JVM-written partitioned posting dirs go through spark_write_path
    (the hook a real s3a backend fills)."""
    from lance_duckdb_spark.operators.fts import (
        build_fts_index,
        search_bm25,
    )
    from lance_duckdb_spark.sources.scalar_index import (
        build_scalar_index,
        scalar_index_scan,
    )
    from lance_duckdb_spark.sources.vector_index import (
        ann_search,
        build_ivf_index,
        read_index_meta,
    )

    register(spark)
    emb = load(spark, sf_dir, "embeddings")
    emb.write.format("lance").mode("overwrite").save(mem_root)
    meta = build_ivf_index(spark, mem_root, k=8)
    assert read_index_meta(mem_root)["k"] == 8
    probes = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = ann_search(spark, mem_root, probes, k_neighbors=5).collect()
    assert len(got) == 15  # 3 probes x 5 neighbors
    assert meta["postings_dir"].startswith("postings")

    # scalar index over a second mem dataset
    sroot = mem_root.rsplit("/", 1)[0] + "/scalar.lance"
    load(spark, sf_dir, "nation").write.format("lance").mode(
        "overwrite"
    ).save(sroot)
    build_scalar_index(spark, sroot, "n_nationkey")
    rows = scalar_index_scan(spark, sroot, "n_nationkey", eq=7).collect()
    assert [r["n_nationkey"] for r in rows] == [7]

    # FTS index dir itself on the object store
    fts_dir = mem_root.rsplit("/", 1)[0] + "/fts_index"
    docs = load(spark, sf_dir, "documents")
    build_fts_index(spark, docs, fts_dir)
    hits = search_bm25(spark, fts_dir, ["the", "data"], k=10).collect()
    assert 0 < len(hits) <= 10
    assert all(r["score"] > 0 for r in hits)


def test_mem_root_default_is_per_user(monkeypatch):
    """r13 (r12 advice): with no env override, the mem:// mirror
    defaults to a per-user, 0700 directory — a fixed world-writable
    /tmp path is both stale-state-prone and tmp-squattable."""
    monkeypatch.delenv(iol._MEM_ROOT_ENV, raising=False)
    root = iol._mem_root()
    assert root.endswith(f"_{os.getuid()}")
    assert (os.stat(root).st_mode & 0o777) == 0o700


def test_promote_local_atomic_publish(tmp_path, monkeypatch, mem_root):
    """r13 (r12 advice): promote_local must stage on the mirror's own
    filesystem and publish with os.replace — a crash between staging
    and publish leaves NOTHING listable at the destination key
    (previously a cross-device shutil.move copied directly onto the
    key, exposing a partial object)."""
    src = tmp_path / "part-00000.parquet"
    src.write_bytes(b"fragment-bytes")
    dst = f"{mem_root}/data/frag-0.parquet"

    # crash injection: die between the staging copy and the publish
    # (each backend has its own publish primitive)
    def boom(*a, **k):
        raise RuntimeError("crash before publish")

    monkeypatch.setattr(iol, "_put_local", boom)
    monkeypatch.setattr(iol, "_pafs_publish", boom)
    with pytest.raises(RuntimeError, match="crash before publish"):
        iol.promote_local(str(src), dst)
    # the partial must not be listable or readable under data/
    assert not iol.exists(dst)
    data_dir = f"{mem_root}/data"
    assert (not iol.isdir(data_dir)) or "frag-0.parquet" not in iol.listdir(
        data_dir
    )

    # happy path: publish succeeds, source consumed, bytes intact
    monkeypatch.undo()
    src2 = tmp_path / "part-00001.parquet"
    src2.write_bytes(b"fragment-bytes-2")
    iol.promote_local(str(src2), dst)
    assert iol.read_bytes(dst) == b"fragment-bytes-2"
    assert not src2.exists()


def test_manifest_dropped_columns_string_entries_normalized():
    """r13 (r12 advice): bare-string dropped_columns entries are
    normalized to dicts at the from_json boundary, so to_json's sort
    key no longer TypeErrors and all three codepaths share one
    representation."""
    m = lf.Manifest.from_json(
        {
            "version": 1,
            "schema_json": "{}",
            "fragments": [],
            "dropped_columns": ["zeta", {"name": "alpha", "at_version": 2}],
        }
    )
    assert m.dropped_names == {"zeta", "alpha"}
    d = m.to_json()  # previously raised TypeError on bare strings
    assert [e["name"] for e in d["dropped_columns"]] == ["alpha", "zeta"]
    assert {e["name"]: e["at_version"] for e in d["dropped_columns"]} == {
        "alpha": 2,
        "zeta": None,
    }
