"""Corpus-curation pipeline operators (SURVEY.md §2.C13-C15):
deterministic sampling, multi-criteria filtering, and
keep-best-duplicate resolution — the glue stages between dedup /
scoring and a final training set.

All deterministic (hash-threshold sampling, explicit tie-breaks),
all JVM-side, all oracle-checked. At 100 TB each is a linear scan
or a single keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .common import (
    SQL_DOC_BUCKET,
    SQL_FINGERPRINT,
    doc_bucket,
    text_fingerprint,
)

SAMPLE_PCT = 20  # per-stratum sample rate (percent)


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample per (lang) stratum via md5-hash
    thresholding — reproducible across engines and runs (no RNG),
    the property that matters when a 100 TB corpus must be
    re-materialized identically."""
    docs = load(spark, sf_dir, "documents")
    # first 4 hex chars of md5(doc_id) → 16 bits → threshold
    bucket = doc_bucket()
    sampled = docs.where(bucket % 100 < SAMPLE_PCT)
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang")
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, COUNT(*) AS n_sampled,
  CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
  MIN(doc_id) AS first_doc
FROM documents
WHERE {SQL_DOC_BUCKET} % 100 < {SAMPLE_PCT}
GROUP BY lang
ORDER BY lang
"""

MIN_CHARS = 150
MAX_CHARS = 900
MIN_WORDS = 30


def filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-criteria quality gate with per-rule attrition counts —
    the observability a curation pipeline needs (how many docs each
    rule removed), computed in one scan."""
    docs = load(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.trim(F.col("text")), " "))
    too_short = F.col("n_chars") < MIN_CHARS
    too_long = F.col("n_chars") > MAX_CHARS
    too_few_words = n_words < MIN_WORDS
    passed = ~too_short & ~too_long & ~too_few_words
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(too_short.cast("int")).cast("long").alias("n_too_short"),
            F.sum(too_long.cast("int")).cast("long").alias("n_too_long"),
            F.sum(too_few_words.cast("int")).cast("long").alias("n_too_few_words"),
            F.sum(passed.cast("int")).cast("long").alias("n_passed"),
        )
        .orderBy("source")
    )


FILTER_PIPELINE_SQL = f"""
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN n_chars < {MIN_CHARS} THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
  CAST(SUM(CASE WHEN n_chars > {MAX_CHARS} THEN 1 ELSE 0 END) AS BIGINT) AS n_too_long,
  CAST(SUM(CASE WHEN len(string_split(trim(text), ' ')) < {MIN_WORDS} THEN 1 ELSE 0 END) AS BIGINT) AS n_too_few_words,
  CAST(SUM(CASE WHEN n_chars >= {MIN_CHARS} AND n_chars <= {MAX_CHARS}
              AND len(string_split(trim(text), ' ')) >= {MIN_WORDS}
            THEN 1 ELSE 0 END) AS BIGINT) AS n_passed
FROM documents
GROUP BY source
ORDER BY source
"""


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: cluster by normalized-text
    fingerprint, keep the 'best' doc per cluster (longest, then
    lowest doc_id) — the canonical argmax-per-group pattern, one
    shuffle on the fingerprint."""
    docs = load(spark, sf_dir, "documents")
    fp = text_fingerprint()
    w = Window.partitionBy("fp").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = docs.withColumn("fp", fp).withColumn("rnk", F.row_number().over(w))
    kept = ranked.where(F.col("rnk") == 1)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
            F.min("doc_id").alias("first_kept"),
        )
        .orderBy("lang")
    )


DEDUP_KEEP_BEST_SQL = f"""
WITH ranked AS (
  SELECT lang, n_chars, doc_id,
    ROW_NUMBER() OVER (
      PARTITION BY {SQL_FINGERPRINT}
      ORDER BY n_chars DESC, doc_id ASC) AS rnk
  FROM documents
)
SELECT lang, COUNT(*) AS n_kept,
  CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
  MIN(doc_id) AS first_kept
FROM ranked WHERE rnk = 1
GROUP BY lang
ORDER BY lang
"""


def _packed_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed filter → dedup → pack frame (one per-doc row
    with its packed sequence index). The text column DIES at the
    first projection — the fingerprint and token count are computed
    in the scan stage, so no shuffle (window, groupBy-apply) ever
    carries document bodies; a plan test asserts no Exchange
    mentions ``text``."""
    import pandas as pd

    from .curation import PACK_BUDGET

    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
        & (F.col("n_chars") >= MIN_CHARS)
        & (F.col("n_chars") <= MAX_CHARS)
        & (F.size(F.split(F.trim(F.col("text")), " ")) >= MIN_WORDS)
    )
    slim = docs.select(
        "source",
        "doc_id",
        "n_chars",
        text_fingerprint().alias("fp"),
        F.size(F.split(F.trim(F.col("text")), " ")).alias("tok"),
    )
    w = Window.partitionBy("fp").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    kept = (
        slim.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("source", "doc_id", "tok")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, seq_idx, fill = [], 0, None
        for tok in pdf["tok"]:
            if fill is None or fill + tok > PACK_BUDGET:
                seq_idx += 1
                fill = tok
            else:
                fill += tok
            seqs.append(seq_idx)
        pdf["seq_idx"] = seqs
        return pdf[["source", "doc_id", "tok", "seq_idx"]]

    return kept.groupBy("source").applyInPandas(
        pack, schema="source string, doc_id long, tok long, seq_idx long"
    )


def pipeline_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data pipeline composition (r10 verdict
    item 7 — real users run the CHAIN, not single operators):
    quality-filter the corpus (the ``filter_pipeline`` gates) →
    resolve duplicate clusters keep-best (the ``dedup_keep_best``
    fingerprint argmax) → greedy first-fit context-window packing
    (the ``sequence_packing`` fold, here emitting the per-doc
    sequence assignment) → ``COPY ... TO`` a lance dataset through
    the SQL surface → read the dataset back and aggregate.

    The hashed artifact is the per-source packed summary read FROM
    THE WRITTEN LANCE DATASET — equal to the oracle's recomputed
    chain iff every stage composed exactly and the COPY roundtrip
    is lossless. Scale shape: one scan of documents (text dropped at
    the first projection — no shuffle carries bodies), one window
    shuffle on the fingerprint, one pack shuffle on source, one
    distributed write."""
    from ..catalog import lance_sql
    from .lance_ops import _fresh_root, register

    register(spark)
    root = _fresh_root(sf_dir, "pipeline_compose")
    _packed_frame(spark, sf_dir).createOrReplaceTempView(
        "__pipeline_packed"
    )
    lance_sql(
        spark,
        f"COPY (SELECT * FROM __pipeline_packed) TO '{root}' "
        f"(FORMAT LANCE, MODE 'overwrite')",
    ).collect()
    packed = lance_sql(spark, f"SELECT * FROM '{root}'")
    return (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("seq_idx").alias("n_sequences"),
            F.sum("tok").cast("long").alias("total_tokens"),
        )
        .orderBy("source")
    )


def _pack_budget_sql() -> str:
    from .curation import PACK_BUDGET

    return f"""
WITH RECURSIVE kept AS (
  SELECT source, doc_id,
    len(string_split(trim(text), ' ')) AS tok
  FROM (
    SELECT source, doc_id, n_chars, text,
      ROW_NUMBER() OVER (
        PARTITION BY {SQL_FINGERPRINT}
        ORDER BY n_chars DESC, doc_id ASC) AS rnk
    FROM documents
    WHERE text IS NOT NULL
      AND n_chars >= {MIN_CHARS} AND n_chars <= {MAX_CHARS}
      AND len(string_split(trim(text), ' ')) >= {MIN_WORDS}
  ) WHERE rnk = 1
),
docs_o AS (
  SELECT source, doc_id, tok,
    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM kept
),
packed AS (
  SELECT source, rn, tok, 1 AS seq_idx, tok AS fill
  FROM docs_o WHERE rn = 1
  UNION ALL
  SELECT d.source, d.rn, d.tok,
    CASE WHEN p.fill + d.tok <= {PACK_BUDGET} THEN p.seq_idx
         ELSE p.seq_idx + 1 END,
    CASE WHEN p.fill + d.tok <= {PACK_BUDGET} THEN p.fill + d.tok
         ELSE d.tok END
  FROM docs_o d JOIN packed p ON d.source = p.source AND d.rn = p.rn + 1
)
SELECT source, COUNT(*) AS n_docs,
  CAST(MAX(seq_idx) AS BIGINT) AS n_sequences,
  CAST(SUM(tok) AS BIGINT) AS total_tokens
FROM packed GROUP BY source ORDER BY source
"""


PIPELINE_COMPOSE_SQL = _pack_budget_sql()


QUERIES = {
    "stratified_sample": stratified_sample,
    "filter_pipeline": filter_pipeline,
    "dedup_keep_best": dedup_keep_best,
    "pipeline_compose": pipeline_compose,
}

ORACLE = {
    "stratified_sample": STRATIFIED_SAMPLE_SQL,
    "filter_pipeline": FILTER_PIPELINE_SQL,
    "dedup_keep_best": DEDUP_KEEP_BEST_SQL,
    "pipeline_compose": PIPELINE_COMPOSE_SQL,
}
