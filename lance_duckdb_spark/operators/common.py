"""Cross-engine numeric discipline shared by all operators.

The driver hash-compares our Spark results against DuckDB running
the ``oracle_sql()`` strings on the same parquet, so float outputs
must be *bit-identical*, not merely close. Two rules make that hold:

1. Money/rate columns in the test data are exactly 2-decimal
   quantized doubles (verified for l_extendedprice, l_quantity,
   l_discount, l_tax, o_totalprice, c_acctbal, events.value). Cast
   each INPUT to a decimal of its natural scale (unambiguous — the
   double sits within ulps of the clean value, never near a .005
   tie), then do all arithmetic in decimal: products and sums are
   exact and associative in both engines. Never round a *computed*
   double to decimal — product ties at .xx5 are common with
   quantized inputs and Spark/DuckDB break them differently.
2. Emit decimals as DOUBLE (deterministic conversion), and express
   averages as decimal-sum / count (double division of identical
   operands). Ratio outputs that cannot be exact are ROUND()ed to a
   fixed scale on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"  # prices, balances, values
RATE = "decimal(4,2)"  # discount/tax and (1 ± x) factors


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def money(col: Column | str) -> Column:
    return _c(col).cast(MONEY)


def rate(col: Column | str) -> Column:
    return _c(col).cast(RATE)


def dsum(expr: Column | str, alias: str) -> Column:
    """Exact decimal sum emitted as double. ``expr`` must already be
    decimal-typed (see money()/rate())."""
    return F.sum(_c(expr)).cast("double").alias(alias)


def dsum2(expr: Column | str, alias: str) -> Column:
    """Exact decimal sum reduced to money scale (2) IN THE DECIMAL
    DOMAIN, then emitted as double. Required whenever the summed
    decimal has scale > 2 (revenue scale 4, charge scale 6): at
    large SF the scaled significand exceeds 2^53 and decimal->double
    stops being unambiguous — Spark's BigDecimal.doubleValue and
    DuckDB's int128/10^scale rounded differently by 1 ulp on
    tpch_q1 sum_charge at sf1. round(dec, 2) breaks ties
    half-away-from-zero in BOTH engines (verified empirically;
    a bare decimal downcast does NOT agree — DuckDB truncates).
    Oracle twin: CAST(ROUND(SUM(x), 2) AS DOUBLE)."""
    return F.round(F.sum(_c(expr)), 2).cast("double").alias(alias)


def davg(expr: Column | str, alias: str) -> Column:
    """Exact decimal sum / count, emitted as double."""
    return (F.sum(_c(expr)).cast("double") / F.count(F.lit(1))).alias(alias)


def revenue_dec() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return money("l_extendedprice") * rate(F.lit(1) - F.col("l_discount"))


def charge_dec() -> Column:
    """revenue * (1 + l_tax), exact decimal."""
    return revenue_dec() * rate(F.lit(1) + F.col("l_tax"))


def text_fingerprint(col: Column | str = "text") -> Column:
    """Normalized-text md5: case-folded, whitespace-collapsed — the
    ONE cluster identity shared by dedup_exact, dedup_keep_best and
    doc_fingerprint (keep in lockstep with SQL_FINGERPRINT)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(_c(col))), "\\s+", " "))


# Oracle-side building blocks (keep in lockstep with the helpers
# above; both sides must do the identical decimal arithmetic).
SQL_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
SQL_CHARGE = f"{SQL_REV} * CAST(1 + l_tax AS DECIMAL(4,2))"
SQL_FINGERPRINT = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"


def doc_bucket(col: Column | str = "doc_id") -> Column:
    """Deterministic 16-bit md5 bucket of a document id — the ONE
    sampling-bucket identity shared by stratified_sample, domain_mix
    and temperature_resample (keep in lockstep with SQL_DOC_BUCKET:
    a drift in any copy is a silent oracle-hash divergence)."""
    return F.conv(
        F.substring(F.md5(_c(col).cast("string")), 1, 4), 16, 10
    ).cast("long")


SQL_DOC_BUCKET = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT)"


def spread(df, min_parts: int = 32):
    """Round-robin repartition ONLY when the input is under-
    partitioned for the session's parallelism (the driver testdata is
    one parquet row group, so its scans start single-task). The
    target is max(min_parts, defaultParallelism) — the fts._spread
    guard: a scan yielding fewer splits than the session has cores
    would serialize the CPU-heavy Python pass that always follows a
    spread() call (r14 review: a fixed 32-split guard no-opped in
    the 32 <= splits < cores band). On a corpus already laid out
    across >= cores splits this is a no-op — the scan stays
    shuffle-free, keeping the 'one scan, no shuffle' ledger of the
    operators that call it true on real data (r8 review finding)."""
    target = max(min_parts, df.sparkSession.sparkContext.defaultParallelism)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def bulk_two_sixths_cuts(lo: int, hi: int) -> list[int]:
    """The shared incremental-maintenance staging split: bulk (first
    four sixths) + two streamed/extended sixths, as [lo, c1, c2,
    hi+1) range boundaries. ONE definition for fts_bm25_incremental,
    stream_index_ingest and stream_fts_ingest — a drift in any copy
    would silently diverge their split semantics (r8 review
    finding)."""
    span = hi - lo + 1
    return [lo, lo + (span * 4) // 6, lo + (span * 5) // 6, hi + 1]
