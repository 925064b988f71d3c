"""Data layout optimization for lance datasets: Z-order clustering.

Zone maps (per-fragment [min,max], lance_format._column_stats) can
only skip fragments when the data is CLUSTERED on the filtered
columns — an append-ordered table has every fragment spanning the
full value range of every column, so a 2-D range predicate prunes
nothing. ``write_zordered`` interleaves the bit-bucketed values of
the chosen columns into a Morton (Z-order) key and range-partitions
the write on it, so every fragment covers a small RECTANGLE of the
(colA, colB) space and the existing zone-map pruning
(datasource._fragment_may_match) turns a 2-D range query into a
scan of only the overlapping rectangles — the Delta/Iceberg OPTIMIZE
ZORDER BY capability, Spark-first.

Everything is built-in codegen arithmetic: per-column uniform
bucketing from a 1-row global min/max aggregate, bit interleave via
shiftleft/bitwise-or, ``repartitionByRange`` + ``sortWithinPartitions``
on the key. One extra shuffle at write time buys every later range
scan its pruning — the standard 100 TB trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 8  # 256 buckets per dimension; 2 dims -> 16-bit z key


def _bucket(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Uniform bucket id in [0, 2^bits) from the global [mn, mx].
    (Quantile cutpoints would handle heavy skew better; uniform is
    the portable default and what the zone maps need for ranges.)"""
    n = F.lit((1 << bits) - 1)
    span = F.when(mx > mn, (mx - mn)).otherwise(F.lit(1.0))
    raw = F.floor(((col.cast("double") - mn) / span) * (n + 1))
    return F.least(n.cast("long"), F.greatest(F.lit(0).cast("long"), raw))


def z_value(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two bucket ids (codegen-only bit ops)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bbit, 2 * i)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_fragments: int = 16,
    bits: int = Z_BITS,
    mode: str = "overwrite",
    expected_version: int | None = None,
) -> None:
    """Write ``df`` as a lance dataset clustered by the Z-order of
    ``cols`` across ``n_fragments`` fragments. ``expected_version``
    adds the optimistic-concurrency option for OPTIMIZE's
    read-then-overwrite (one implementation — the previous CAS twin
    was a byte-level clone of this body; r8 review).

    Refuses columns whose values cast('double') to NULL (non-numeric
    strings, arrays): a NULL bucket silently degenerates every row
    to bucket 0 on that dimension and the caller believes 2-D
    pruning is in place while range scans prune nothing (r8
    review)."""
    ca, cb = cols
    stats = df.agg(
        F.min(F.col(ca).cast("double")).alias("a_mn"),
        F.max(F.col(ca).cast("double")).alias("a_mx"),
        F.min(F.col(cb).cast("double")).alias("b_mn"),
        F.max(F.col(cb).cast("double")).alias("b_mx"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    if stats.n and (stats.a_mn is None or stats.b_mn is None):
        bad = [
            c
            for c, mn in ((ca, stats.a_mn), (cb, stats.b_mn))
            if mn is None
        ]
        raise ValueError(
            f"write_zordered: columns {bad} have no numeric values "
            "(cast to double is NULL everywhere) — a Z-order over "
            "them would silently collapse to one dimension; pick "
            "numeric/temporal columns"
        )
    za = _bucket(F.col(ca), F.lit(stats.a_mn), F.lit(stats.a_mx), bits)
    zb = _bucket(F.col(cb), F.lit(stats.b_mn), F.lit(stats.b_mx), bits)
    keyed = df.withColumn("__z", z_value(za, zb, bits))
    writer = (
        keyed.repartitionByRange(n_fragments, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format("lance")
        .mode(mode)
    )
    if expected_version is not None:
        writer = writer.option("expectedVersion", str(expected_version))
    writer.save(path)


def optimize(
    spark,
    root: str,
    zorder_cols: tuple[str, str] | None = None,
    n_fragments: int = 16,
    bits: int = Z_BITS,
):
    """In-place OPTIMIZE for an EXISTING dataset (Delta's
    ``OPTIMIZE [table] ZORDER BY`` shape): read the current head
    (deletion vectors applied, evolved schema honored — the read
    goes through the normal lance scan), re-cluster on the Z-order
    key, and commit as a new OVERWRITE version. Old versions remain
    time-travelable; their files are reclaimed by
    ``lance_format.cleanup_old_versions``. Without ``zorder_cols``
    this is plain fragment compaction (lance_format.compact).

    Safe to read-and-overwrite in one job: scan partitions are
    planned from the old manifest over immutable fragment files;
    the write only adds new files and then publishes a new
    manifest."""
    from . import lance_format as lf
    from .datasource import register

    if zorder_cols is None:
        return lf.compact(root)
    register(spark)
    # optimistic concurrency (same CAS as the compact branch): pin
    # the version this maintenance read, and let the overwrite
    # commit REFUSE if a concurrent writer advanced the head in
    # between — without it the re-cluster would silently drop the
    # concurrent append's rows from the new head (r5 review finding)
    start_version = lf.read_manifest(root).version
    head = (
        spark.read.format("lance")
        .option("version", str(start_version))
        .load(root)
    )
    write_zordered(
        head,
        root,
        zorder_cols,
        n_fragments,
        bits,
        mode="overwrite",
        expected_version=start_version,
    )
    return lf.read_manifest(root)
