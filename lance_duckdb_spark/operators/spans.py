"""Span-level operators over the documents table.

Whole-document dedup (dedup.py) misses the common crawl failure
mode where two documents are distinct but SHARE long copied spans
(quoted articles, licence blocks, templated sections). The standard
remedy (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better") marks every K-token gram that occurs in
more than one document and measures, per document, how much of it
is covered by such duplicated spans — a linear-work, span-level
complement to the pairwise operators (reference parity anchor:
the reference exposes only whole-row dedup through DuckDB SQL;
span coverage is part of the beyond-reference training-data
surface, same family as curation.py's boilerplate_lines which does
the line-granularity version).

Scale shape (100 TB posture):
- grams are md5-hashed BEFORE any shuffle, so the wide text column
  never leaves the scan stage; everything downstream moves
  (doc_id, pos, 16-byte unhex(md5) binary) rows — the bijective
  binary form halves the hex key's shuffle bytes with equality
  semantics identical to the oracle's md5-text grouping. A
  production deployment would shrink the key further with
  xxhash64 — md5 is kept because cross-engine grouping must be
  collision-identical, and the digest itself never reaches the
  output.
- the tokenize+hash pass runs ONCE: the per-doc gram arrays are
  parquet-spilled (materialize.py) and re-read by the dup
  detection, the hit join, and the final per-doc frame, instead of
  recomputing the dominant split+md5 CPU per consumer.
- gram generation is transform()+posexplode over the split array —
  per-row JVM codegen, no window, no shuffle, no Python.
- duplicated-gram detection is one groupBy(gh) with map-side
  partial aggregation on uniform hash keys (no skew: a gram
  repeated k times contributes k rows to ONE reducer, and k is
  bounded by corpus duplication, not corpus size).
- coverage is a per-document sort-window: intervals of equal
  length K sorted by start union to
  sum(min(K, pos_i - pos_{i-1})) + K — one pass, integer
  arithmetic, bit-identical across engines (no interval trees, no
  quadratic merging).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load

# span length in whitespace tokens. Testdata docs hold >=10 tokens
# (min observed); real pipelines use 50 on BPE tokens — the plan is
# length-independent, only the constant changes.
SPAN_K = 8

# RAG-style chunking: window of CHUNK_TOKENS tokens, stride
# CHUNK_STRIDE (overlap = CHUNK_TOKENS - CHUNK_STRIDE).
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def _gram_hashes(k: int):
    """Array of unhex(md5(k-token gram)) for every start position of
    the whitespace-token array — one JVM expression, no shuffle.
    Index i of the result is the gram starting at 0-based token i.
    The key is the 16-BYTE BINARY digest, not the 32-char hex string:
    unhex is bijective, so grouping/joining on it is equality-
    identical to the oracle's md5-text grouping while shuffling half
    the key bytes — and the key never reaches the output, so the
    oracle needs no change. Docs shorter than k tokens yield an
    EMPTY array: Spark's sequence(1, n) DESCENDS for n < 1 (the
    char_entropy gotcha) while DuckDB's generate_series is empty, so
    the short case is guarded explicitly."""
    toks = F.split(F.trim(F.col("text")), " ")
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.unhex(
                F.md5(F.concat_ws(" ", F.slice(toks, i, k)))
            ),
        ),
    ).otherwise(F.array().cast("array<binary>"))


def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of a
    document's tokens covered by SPAN_K-token grams that also occur
    in at least one OTHER document. Exact and deterministic, so the
    oracle replicates the algorithm and the row hash-checks;
    documents shorter than SPAN_K tokens (none in the testdata, but
    guarded) and documents with no shared span report 0 coverage.

    covered_frac is an exact IEEE division of two integers —
    identical in both engines, no rounding needed.

    The tokenize+md5 pass is SPILLED once (materialize.py) and
    re-read by all three consumers (dup detection, the hit join,
    the final per-doc frame): the naive plan recomputes the gram
    arrays for every consumer, which at sf1 tripled the dominant
    split+slice+md5 CPU and re-scanned the wide text column three
    times (measured 11.5s -> 3.4s at sf0.1, bit-identical rows).
    The spill carries only (doc_id, source, n_tokens, ghs) — the
    text column never leaves the first scan stage."""
    from ..materialize import spill_to_parquet

    toks = F.split(F.trim(F.col("text")), " ")
    docs = spill_to_parquet(
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            F.size(toks).alias("n_tokens"),
            _gram_hashes(SPAN_K).alias("ghs"),
        ),
        "span-grams",
    )
    grams = docs.select(
        "doc_id", F.posexplode("ghs").alias("pos", "gh")
    )
    # grams occurring in >= 2 distinct docs; count(distinct) over the
    # md5 key — uniform, two-phase partial agg
    dup = (
        grams.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .where(F.col("ndocs") >= 2)
        .select("gh")
    )
    hits = grams.join(dup, "gh").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    # equal-length sorted intervals: union length telescopes to
    # min(K, gap) per interval, K for the first
    contrib = F.coalesce(
        F.least(F.lit(SPAN_K), F.col("pos") - F.lag("pos").over(w)),
        F.lit(SPAN_K),
    )
    cov = (
        hits.withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dup_grams"),
            F.sum("contrib").cast("long").alias("covered_tokens"),
        )
    )
    return (
        docs.select("doc_id", "source", "n_tokens")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.coalesce("dup_grams", F.lit(0)).cast("long").alias("dup_grams"),
            F.coalesce("covered_tokens", F.lit(0))
            .cast("long")
            .alias("covered_tokens"),
            (
                F.coalesce("covered_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens")
            ).alias("covered_frac"),
        )
        .orderBy("doc_id")
    )


DEDUP_SPAN_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(trim(text), ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(t[i:i+{SPAN_K - 1}], ' ')) AS gh
  FROM (
    SELECT doc_id, t,
           unnest(generate_series(1, len(t) - {SPAN_K - 1})) AS i
    FROM toks
  )
),
dup AS (
  SELECT gh FROM grams GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gh)
),
cov AS (
  SELECT doc_id, COUNT(*) AS dup_grams,
    CAST(SUM(contrib) AS BIGINT) AS covered_tokens
  FROM (
    SELECT doc_id, COALESCE(LEAST({SPAN_K},
      pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)),
      {SPAN_K}) AS contrib
    FROM hits
  ) GROUP BY doc_id
)
SELECT d.doc_id, d.source, len(d.t) AS n_tokens,
  COALESCE(c.dup_grams, 0) AS dup_grams,
  COALESCE(c.covered_tokens, 0) AS covered_tokens,
  CAST(COALESCE(c.covered_tokens, 0) AS DOUBLE) / len(d.t) AS covered_frac
FROM toks d LEFT JOIN cov c USING (doc_id)
ORDER BY doc_id
"""


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style chunking: overlapping CHUNK_TOKENS-token windows at
    CHUNK_STRIDE, the retrieval-unit producer feeding an embedding +
    ANN index stage (similarity.py). Output carries the chunk's md5
    (not its text) so the hashed driver row stays narrow; a real
    pipeline selects the text column instead — same plan, wider
    rows. EVERY token lands in at least one chunk: starts advance by
    CHUNK_STRIDE until a window reaches the end of the document, the
    final chunk truncating to the tail (r8 review: the previous
    full-windows-only rule silently left up to CHUNK_STRIDE-1
    trailing tokens of every long document unindexed — unretrievable
    content in a retrieval-unit producer).

    Plan: transform+posexplode per row — no shuffle at all until the
    final presentation sort; chunking 100 TB is embarrassingly
    parallel and this plan keeps it that way."""
    toks = F.split(F.trim(F.col("text")), " ")
    n = F.size(toks)
    # starts: 0, STRIDE, 2*STRIDE, ...; the last start is the first
    # one with start + TOKENS >= n, so the tail is always covered:
    # n_chunks = 1 + max(0, ceil((n - TOKENS) / STRIDE))
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0),
        F.floor(
            (n - CHUNK_TOKENS + CHUNK_STRIDE - 1) / CHUNK_STRIDE
        ).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.struct(
            F.concat_ws(
                " ",
                F.slice(toks, c * CHUNK_STRIDE + 1, CHUNK_TOKENS),
            ).alias("chunk_text"),
            F.least(n - c * CHUNK_STRIDE, F.lit(CHUNK_TOKENS)).alias(
                "chunk_tokens"
            ),
        ),
    )
    return (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "source", F.posexplode(chunks).alias("chunk_id", "c"))
        .select(
            "doc_id",
            "source",
            "chunk_id",
            F.col("c.chunk_tokens").alias("chunk_tokens"),
            F.md5(F.col("c.chunk_text")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(trim(text), ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
n_chunks AS (
  SELECT doc_id, source, t,
    1 + GREATEST(0, CAST(FLOOR(
      (len(t) - {CHUNK_TOKENS} + {CHUNK_STRIDE - 1}) / {CHUNK_STRIDE}.0
    ) AS INTEGER)) AS nc
  FROM toks
)
SELECT doc_id, source, c - 1 AS chunk_id,
  LEAST(len(t) - (c - 1) * {CHUNK_STRIDE}, {CHUNK_TOKENS}) AS chunk_tokens,
  md5(array_to_string(
    t[(c - 1) * {CHUNK_STRIDE} + 1 :
      (c - 1) * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')) AS chunk_md5
FROM (
  SELECT doc_id, source, t, unnest(generate_series(1, nc)) AS c
  FROM n_chunks
)
ORDER BY doc_id, chunk_id
"""


QUERIES = {
    "dedup_span_coverage": dedup_span_coverage,
    "chunk_documents": chunk_documents,
}

ORACLE = {
    "dedup_span_coverage": DEDUP_SPAN_COVERAGE_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
}
