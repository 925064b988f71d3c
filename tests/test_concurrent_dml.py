"""Concurrent-DML conflict semantics (r12 — VERDICT item 2).

The manifest commit CAS (``expected_version`` + exclusive create,
lance_format.commit) must make racing DML refuse-or-serialize, never
last-writer-win: two concurrent deletion-vector DELETEs may not drop
each other's masks, and DELETE racing OPTIMIZE/compaction may not
resurrect deleted rows via the manifest swap. These tests run the
real races on threads (the r5 concurrent-append test's style) and
assert the COMMITTED-STATE invariants in every interleaving the
scheduler produces:

- at least one racer commits; every loser fails LOUDLY with the
  concurrent-commit error (never silently dropped work);
- the committed state reflects exactly the SUCCESSFUL operations
  (no resurrected rows, no half-applied masks);
- a refused operation re-run against the new head lands correctly.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.sources import lance_format as lf
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.sources.maintenance import delete_where_sql


def _mk(spark, tmp_path, n=400, parts=4):
    register(spark)
    root = str(tmp_path / "cdml.lance")
    spark.range(n).select(
        F.col("id").cast("long").alias("x")
    ).repartition(parts).write.format("lance").mode("overwrite").save(
        root
    )
    return root


def _live(spark, root):
    return {
        r["x"] for r in spark.read.format("lance").load(root).collect()
    }


def _race(ops):
    """Run callables concurrently behind one barrier; return
    [(result | None, exception | None), ...] in ops order."""
    barrier = threading.Barrier(len(ops))
    out = [(None, None)] * len(ops)

    def run(i, op):
        try:
            barrier.wait()
            out[i] = (op(), None)
        except Exception as e:  # noqa: BLE001 — asserted below
            out[i] = (None, e)

    ts = [
        threading.Thread(target=run, args=(i, op))
        for i, op in enumerate(ops)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return out


def test_concurrent_delete_delete(spark, tmp_path):
    """Two deletion-vector DELETEs racing on one dataset: the CAS
    serializes them — a loser refuses loudly (its orphaned mask
    files are vacuum-reclaimable, never referenced), and no
    interleaving can drop the winner's mask."""
    root = _mk(spark, tmp_path)
    base = _live(spark, root)
    preds = ["x % 10 = 0", "x % 10 = 5"]
    results = _race(
        [lambda p=p: delete_where_sql(spark, root, p) for p in preds]
    )
    ok = [i for i, (_, e) in enumerate(results) if e is None]
    assert ok, f"both racers failed: {results}"
    for _, e in results:
        if e is not None:
            assert isinstance(e, lf.LanceDatasetError)
            assert "concurrent commit" in str(e)
    # committed state == base minus exactly the successful deletes
    expect = set(base)
    for i in ok:
        mod = 0 if i == 0 else 5
        assert results[i][0] == sum(1 for x in base if x % 10 == mod)
        expect -= {x for x in base if x % 10 == mod}
    assert _live(spark, root) == expect
    # a refused racer re-run against the new head lands, and the
    # second mask MERGES with (never replaces) the first
    for i, (_, e) in enumerate(results):
        if e is not None:
            n = delete_where_sql(spark, root, preds[i])
            assert n == sum(1 for x in base if x % 10 == (0, 5)[i])
    assert _live(spark, root) == {
        x for x in base if x % 10 not in (0, 5)
    }


def test_delete_racing_optimize(spark, tmp_path):
    """DELETE racing compaction (OPTIMIZE's engine): whichever
    commits second must refuse — a compaction manifest swap that
    ignored a freshly-committed mask would RESURRECT the deleted
    rows; a delete keyed to pre-compaction fragment files would mask
    the wrong positions. Asserts no interleaving resurrects."""
    root = _mk(spark, tmp_path, n=400, parts=4)
    base = _live(spark, root)

    results = _race(
        [
            lambda: delete_where_sql(spark, root, "x % 7 = 3"),
            lambda: lf.compact(root, target_rows=10_000),
        ]
    )
    del_n, del_err = results[0]
    _, opt_err = results[1]
    for e in (del_err, opt_err):
        if e is not None:
            assert isinstance(e, lf.LanceDatasetError)
            assert "concurrent commit" in str(e)
    assert del_err is None or opt_err is None, results
    deleted = {x for x in base if x % 7 == 3}
    if del_err is None:
        # the delete committed: its rows are gone NOW and must stay
        # gone through any later compaction (no resurrect)
        assert del_n == len(deleted)
        assert _live(spark, root) == base - deleted
        lf.compact(root, target_rows=10_000)
        assert _live(spark, root) == base - deleted
        man = lf.read_manifest(root)
        # compaction materialized the masks
        assert all(f.deletion_file is None for f in man.fragments)
    else:
        # compaction won; the delete refused loudly — re-run it
        assert _live(spark, root) == base
        n = delete_where_sql(spark, root, "x % 7 = 3")
        assert n == len(deleted)
        assert _live(spark, root) == base - deleted


def test_concurrent_update_refuses_or_serializes(spark, tmp_path):
    """The rewrite path (UPDATE) under the same race: two UPDATEs
    racing commit in some serial order or refuse — never a merged
    half-state."""
    from lance_duckdb_spark.sources.maintenance import update_where_sql

    root = _mk(spark, tmp_path)
    base = _live(spark, root)
    results = _race(
        [
            lambda: update_where_sql(
                spark, root, {"x": "x + 1000000"}, "x % 2 = 0"
            ),
            lambda: update_where_sql(
                spark, root, {"x": "x + 2000000"}, "x % 2 = 1"
            ),
        ]
    )
    ok = [i for i, (_, e) in enumerate(results) if e is None]
    assert ok, f"both racers failed: {results}"
    for _, e in results:
        if e is not None:
            assert "concurrent commit" in str(e)
    expect = set()
    for x in base:
        bump = 0
        if 0 in ok and x % 2 == 0:
            bump = 1000000
        if 1 in ok and x % 2 == 1:
            bump = 2000000
        expect.add(x + bump)
    assert _live(spark, root) == expect
