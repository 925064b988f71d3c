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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
