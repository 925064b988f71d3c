"""Ranking / distribution window functions and array functions
(SURVEY.md §2.B34-B35) — rounding out the SQL-function surface a
lance-duckdb (DuckDB) user has available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load


def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / rank / dense_rank over
    customer balances per segment. c_acctbal ties are possible, so
    every function here is tie-stable by definition (they depend
    only on the ORDER BY key values, not row order)."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    enriched = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )
    # aggregate to a compact, order-insensitive result
    return (
        enriched.groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("pct_rank"), 6).alias("min_pct_rank"),
            F.round(F.max("cume"), 6).alias("max_cume"),
            F.max("rnk").alias("max_rank"),
            F.max("drnk").alias("max_dense_rank"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


WINDOW_RANK_SQL = """
WITH enriched AS (
  SELECT c_mktsegment, c_acctbal,
    ntile(4) OVER w AS quartile,
    ROUND(percent_rank() OVER w, 6) AS pct_rank,
    ROUND(cume_dist() OVER w, 6) AS cume,
    rank() OVER w AS rnk,
    dense_rank() OVER w AS drnk
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
)
SELECT c_mktsegment, CAST(quartile AS INTEGER) AS quartile,
  COUNT(*) AS n,
  ROUND(MIN(pct_rank), 6) AS min_pct_rank,
  ROUND(MAX(cume), 6) AS max_cume,
  CAST(MAX(rnk) AS BIGINT) AS max_rank,
  CAST(MAX(drnk) AS BIGINT) AS max_dense_rank
FROM enriched
GROUP BY c_mktsegment, quartile
ORDER BY c_mktsegment, quartile
"""


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/list function surface over the embedding column:
    size, element extremes, slicing, sorting, containment — mapped
    1:1 to DuckDB list functions. Float elements rounded to 5 (the
    float32→double widening is exact; rounding only guards the
    min/max reductions)."""
    emb = load(spark, sf_dir, "embeddings")
    arr = F.col("embedding")
    return (
        emb.where(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size(arr).alias("dim"),
            F.round(F.array_max(arr).cast("double"), 5).alias("max_el"),
            F.round(F.array_min(arr).cast("double"), 5).alias("min_el"),
            F.round(
                F.element_at(F.sort_array(arr), 32).cast("double"), 5
            ).alias("median_lo"),
            F.round(F.element_at(arr, 1).cast("double"), 5).alias("first_el"),
            (F.array_position(F.sort_array(arr, asc=False), F.array_max(arr)) == 1)
            .alias("max_is_first_desc"),
        )
        .orderBy("vec_id")
    )


ARRAY_FUNCS_SQL = """
SELECT vec_id,
  len(embedding) AS dim,
  ROUND(CAST(list_max(embedding) AS DOUBLE), 5) AS max_el,
  ROUND(CAST(list_min(embedding) AS DOUBLE), 5) AS min_el,
  ROUND(CAST(list_sort(embedding)[32] AS DOUBLE), 5) AS median_lo,
  ROUND(CAST(embedding[1] AS DOUBLE), 5) AS first_el,
  list_position(list_reverse_sort(embedding), list_max(embedding)) = 1 AS max_is_first_desc
FROM embeddings
WHERE vec_id < 100
ORDER BY vec_id
"""


QUERIES = {
    "window_rank_functions": window_rank_functions,
    "array_functions": array_functions,
}

ORACLE = {
    "window_rank_functions": WINDOW_RANK_SQL,
    "array_functions": ARRAY_FUNCS_SQL,
}
