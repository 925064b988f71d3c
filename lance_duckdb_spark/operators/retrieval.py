"""Retrieval / sequence primitives (SURVEY.md §2.C17, B33):
TF-IDF term scoring over documents and the event-transition matrix
over user event sequences.

Scale: tf-idf is two keyed aggregations (term stats are tiny after
the first groupBy); transitions are one window shuffle on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (first 50 docs): tf = term
    count in doc, idf = ln(N / df). ln/division rounded to 6 on both
    sides; ties broken by term for determinism."""
    docs = load(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    terms = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = terms.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # the term→df map grows with the corpus vocabulary (billions of
    # distinct tokens at 100 TB) — do NOT broadcast it; both sides
    # are already keyed on `term`, so a shuffled equi-join is the
    # scale-safe shape and AQE will downgrade to broadcast on its own
    # when the vocabulary is actually small.
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            # ONE round over the full product — deliberately NOT the
            # BM25 round-the-ln-first rule: measured on this corpus,
            # rounding the idf to 6 first makes Spark's decimal-based
            # HALF_UP round and DuckDB's scaled-multiply round
            # disagree at the 6th decimal on many idf values, and the
            # tf multiply amplifies that into wrong hashes; the
            # single-round product form has been hash-exact at
            # sf0.001-1 across five rounds (1-ulp ln drift never
            # lands the PRODUCT on a .5e-7 boundary here)
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.where(F.col("doc_id") < 50)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


TFIDF_SQL = """
WITH terms AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms)
  GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.term,
    ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
    ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, term ASC) AS rnk
  FROM scored WHERE doc_id < 50
)
SELECT doc_id, term, tfidf, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 3
ORDER BY doc_id, rnk
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style transition matrix: counts of consecutive
    (prev_event → event) pairs per user ordering, aggregated."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w)).where(
        F.col("prev_type").isNotNull()
    )
    return (
        seq.groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "event_type")
    )


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type,
    lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type, COUNT(*) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, event_type
"""


QUERIES = {
    "tfidf_top_terms": tfidf_top_terms,
    "event_transitions": event_transitions,
}

ORACLE = {
    "tfidf_top_terms": TFIDF_SQL,
    "event_transitions": EVENT_TRANSITIONS_SQL,
}
