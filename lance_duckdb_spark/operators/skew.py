"""Skew-mitigation utilities (SURVEY.md §6).

At 100 TB a handful of hot keys (one viral document source, one
power user) can stall a shuffle stage for hours. Two standard
remedies, exposed as composable helpers (results are *identical* to
the unsalted plans — asserted in tests/test_skew.py):

- ``salted_agg``: two-phase aggregation — groupBy((key, salt)) with
  map-side partial agg, then re-aggregate by key. Splits each hot
  key across ``n_salts`` reducers.
- ``salted_broadcast_replicate_join``: for a big⋈small join where
  the big side has hot keys and the small side is broadcastable,
  Spark's broadcast join already avoids the shuffle entirely; for
  big⋈medium, replicate the medium side ``n_salts`` times with an
  explicit salt column and salt the big side randomly-but-
  deterministically (hash of a unique column), turning one hot
  reducer into ``n_salts`` even ones.

AQE's skew-join splitting (on in session.py) handles the
sort-merge case automatically at runtime; these helpers are for the
aggregation path and for engines/options where AQE can't see the
skew (e.g. a first-stage groupBy with an exploding key).
"""

from __future__ import annotations

import uuid
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .common import money


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    partial_aggs: Callable[[], Sequence[Column]],
    final_aggs: Callable[[], Sequence[Column]],
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs()`` aggregates within (key, salt); ``final_aggs()``
    must re-aggregate the partial columns to the true totals (sum of
    sums, sum of counts, min of mins, ...). ``salt_col`` is any
    column with high cardinality inside a key group (a unique id);
    the salt is hash(salt_col) % n_salts — deterministic, so results
    are reproducible.
    """
    salt = f"_salt_{uuid.uuid4().hex[:8]}"  # collision-proof temp col
    salted = df.withColumn(salt, F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)))
    partial = salted.groupBy(*key_cols, salt).agg(*partial_aggs())
    return partial.drop(salt).groupBy(*key_cols).agg(*final_aggs())


def replicate_salted_join(
    big: DataFrame,
    medium: DataFrame,
    key: str,
    big_unique_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """big ⋈ medium equi-join with the big side's hot keys split
    across ``n_salts`` reducers; the medium side is replicated
    n_salts times. Join output is identical to the plain join."""
    salt = f"_salt_{uuid.uuid4().hex[:8]}"  # collision-proof temp col
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias(salt)
    medium_rep = medium.select("*", salts)
    big_salted = big.withColumn(
        salt, F.pmod(F.xxhash64(F.col(big_unique_col)), F.lit(n_salts))
    )
    return big_salted.join(medium_rep, [key, salt]).drop(salt)


# -- driver-checked planted-skew query --------------------------------------

SKEW_SALTS = 16
# 9 of every 10 users collapse onto hot key -1: a deterministic,
# oracle-expressible stand-in for the one-viral-source / power-user
# distribution that stalls real shuffles. ~90% of all events land on
# a single group key.
_HOT_KEY_SQL = "CASE WHEN user_id % 10 <> 0 THEN -1 ELSE user_id END"


def _hot_key() -> Column:
    return (
        F.when(F.col("user_id") % 10 != 0, F.lit(-1))
        .otherwise(F.col("user_id"))
        .cast("bigint")
    )


def skewed_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate events over a planted hot key (~90% of rows on one
    group) WITHOUT a hot reducer: ``salted_agg`` splits each key
    across ``SKEW_SALTS`` (key, salt) partial groups — map-side
    partial agg shrinks each to one row, the final re-agg by key
    touches SKEW_SALTS rows per key. No reducer ever materializes
    the hot group's row set, so the plan survives a key holding 90%
    of 100 TB. Results are identical to the unsalted plan (decomposable
    aggregates only: count/sum/min/max; avg derived at the end).

    tests/test_skew.py::test_skewed_hot_key_agg_balanced asserts the
    balance property directly: the largest (key, salt) partial group
    is ~1/SKEW_SALTS of the hot key's rows, not 100% of them.
    """
    ev = load(spark, sf_dir, "events").withColumn("skew_key", _hot_key())
    out = salted_agg(
        ev,
        ["skew_key"],
        lambda: [
            F.count(F.lit(1)).alias("pn"),
            F.sum(money("value")).alias("psum"),
            F.min("ts_us").alias("pmin"),
            F.max("ts_us").alias("pmax"),
        ],
        lambda: [
            F.sum("pn").alias("n_events"),
            F.sum("psum").cast("double").alias("sum_value"),
            F.min("pmin").alias("first_us"),
            F.max("pmax").alias("last_us"),
        ],
        salt_col="event_id",
        n_salts=SKEW_SALTS,
    )
    return out.select(
        "skew_key",
        "n_events",
        "sum_value",
        F.round(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
        "first_us",
        "last_us",
    ).orderBy("skew_key")


SKEWED_HOT_KEY_SQL = f"""
SELECT {_HOT_KEY_SQL} AS skew_key,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
         AS avg_value,
       MIN(epoch_us(ts)) AS first_us,
       MAX(epoch_us(ts)) AS last_us
FROM events
GROUP BY 1
ORDER BY skew_key
"""


def skewed_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join over the same planted hot key (~90% of events
    on one join key) through ``replicate_salted_join``: the per-key
    profile side is replicated SKEW_SALTS times and the big side is
    salted on hash(event_id), so the join shuffles on (key, salt) —
    no reducer ever receives the hot key's full row set (the failure
    mode that stalls a 100 TB shuffle for hours; the reference
    inherits skew handling from DuckDB's radix-partitioned hash
    join, Spark needs the remedy demonstrated). The profile side is
    itself built skew-safely via ``salted_agg``. Join output is
    identical to the plain join (tests/test_skew.py), and the final
    per-type rollup hash-matches the oracle's unsalted computation.
    """
    ev = load(spark, sf_dir, "events").withColumn("skew_key", _hot_key())
    key_profile = salted_agg(
        ev,
        ["skew_key"],
        lambda: [
            F.count(F.lit(1)).alias("pn"),
            F.sum(money("value")).alias("psum"),
        ],
        lambda: [
            F.sum("pn").alias("key_n"),
            F.sum("psum").alias("key_sum_dec"),
        ],
        salt_col="event_id",
        n_salts=SKEW_SALTS,
    )
    joined = replicate_salted_join(
        ev.select("skew_key", "event_type", "event_id"),
        key_profile,
        key="skew_key",
        big_unique_col="event_id",
        n_salts=SKEW_SALTS,
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("key_n").cast("bigint").alias("sum_key_n"),
            F.max("key_sum_dec").cast("double").alias("max_key_sum"),
            F.countDistinct("skew_key").alias("n_keys"),
        )
        .orderBy("event_type")
    )


SKEWED_HOT_KEY_JOIN_SQL = f"""
WITH e AS (
  SELECT {_HOT_KEY_SQL} AS skew_key, event_type, value FROM events
),
k AS (
  SELECT skew_key, COUNT(*) AS key_n,
         SUM(CAST(value AS DECIMAL(18,2))) AS key_sum
  FROM e GROUP BY skew_key
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(k.key_n) AS BIGINT) AS sum_key_n,
       CAST(MAX(k.key_sum) AS DOUBLE) AS max_key_sum,
       COUNT(DISTINCT e.skew_key) AS n_keys
FROM e JOIN k USING (skew_key)
GROUP BY e.event_type
ORDER BY e.event_type
"""


QUERIES = {
    "skewed_hot_key_join": skewed_hot_key_join,
    "skewed_hot_key_agg": skewed_hot_key_agg,
}

ORACLE = {
    "skewed_hot_key_join": SKEWED_HOT_KEY_JOIN_SQL,
    "skewed_hot_key_agg": SKEWED_HOT_KEY_SQL,
}
