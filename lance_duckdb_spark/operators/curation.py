"""Training-data curation operators, round 2 (beyond SURVEY §2.C13-15):
benchmark contamination check, intra-doc repetition filtering,
training-sequence packing, domain mixture rebalancing, and
cross-source duplicate overlap.

These are the remaining stages a 100 TB pretraining pipeline runs
between raw crawl and tokenized shards. Scale shapes:
- contamination / overlap: equi-joins keyed on gram/fingerprint —
  candidates are hash-bounded, never O(N²);
- repetition / packing: per-document (narrow) or per-source
  (applyInPandas) work, linear scans;
- domain mix: one tiny per-lang aggregate joined back (AQE
  broadcasts it on its own).

All except nothing are oracle-checked: even the greedy packer has an
exact DuckDB twin (recursive CTE), because determinism — same input,
same packed sequences, on any engine — is itself a property worth
testing in a pipeline that must be re-runnable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .common import (
    SQL_DOC_BUCKET,
    SQL_FINGERPRINT,
    doc_bucket,
    spread as _spread,
    text_fingerprint,
)

# -- contamination ----------------------------------------------------------

CONTAM_N = 7  # word n-gram size
BENCH_MOD = 17  # doc_id % BENCH_MOD == 0 → "benchmark" member
# (17 — not 97 — so the planted dup structure in the synthetic corpus
# intersects the benchmark set at every SF: an empty hit table would
# make the check vacuous at the driver's gate scale)


def _word_ngrams(n: int):
    """Distinct-word-n-gram set per doc, for dedup._gram_rows (the
    shared Arrow-batched shingling scaffold — one tokenization whose
    byte-parity with the oracles is maintained in ONE place; a JVM
    transform(sequence, ...) chain measured 5.8x slower at sf1,
    13.8s vs 2.4s, because HOF lambdas are interpreted per gram).
    strip SPACES only: SQL trim() does not touch \\t\\n\\r, and gram
    strings must match the oracle byte-for-byte. Falsy return drops
    the doc, mirroring the oracle's empty list_transform."""

    def grams_of(txt):
        if txt is None:
            return None
        w = txt.strip(" ").split(" ")
        if len(w) < n:
            return None
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    return grams_of


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: which corpus docs share a word
    7-gram with a held-out benchmark set (here: every 17th doc —
    see the BENCH_MOD note above — standing in for an eval
    benchmark)? The standard pre-training
    hygiene scan (e.g. GPT-3's 13-gram dedup against its evals).

    Candidate generation is an equi-join on the gram string — at
    100 TB the benchmark side is tiny and broadcastable, the corpus
    side streams; no pair enumeration ever happens."""
    from .dedup import _gram_rows

    docs = load(spark, sf_dir, "documents")
    grams = _gram_rows(docs, ["source"], _word_ngrams(CONTAM_N), "gram")
    # no .distinct(): _gram_rows emits each doc's grams as a set, so
    # (bench_doc, gram) pairs are already unique — a distinct here is
    # a pure no-op shuffle of the whole bench gram table.
    # The bench-doc filter runs BEFORE the Arrow shingling pass (r14
    # optimization): ``doc_id % BENCH_MOD`` cannot push through the
    # opaque mapInPandas, so deriving bench from ``grams`` re-ran the
    # full-corpus shingler a second time and filtered 16/17 of its
    # output away. Shingling only the bench slice emits identical
    # (doc_id, gram) rows — grams_of depends on text alone.
    bench = _gram_rows(
        docs.where(F.col("doc_id") % BENCH_MOD == 0),
        [],
        _word_ngrams(CONTAM_N),
        "gram",
    ).select(F.col("doc_id").alias("bench_doc"), "gram")
    # join strategy stays PLANNER-CHOSEN (r14 review): bench is
    # corpus-proportional (every 17th doc's gram expansion), so a
    # forced F.broadcast would trade AQE's graceful shuffle fallback
    # for a hard 8 GB broadcast-relation failure at scale. With AQE
    # on, the runtime size of the materialized bench exchange still
    # converts this to a broadcast join whenever bench is actually
    # small — the local win without the scale cliff.
    hits = (
        grams.join(bench, "gram")
        .where(F.col("doc_id") != F.col("bench_doc"))
        .select("doc_id", "source", "gram")
        .distinct()
    )
    return (
        hits.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("contaminated_docs"),
            F.count(F.lit(1)).alias("contaminated_grams"),
        )
        .orderBy("source")
    )


CONTAMINATION_SQL = f"""
WITH grams AS (
  SELECT doc_id, source, unnest(list_distinct(list_transform(
    range(1, greatest(len(string_split(trim(text), ' ')) - {CONTAM_N - 2}, 1)),
    i -> array_to_string(string_split(trim(text), ' ')[i:i+{CONTAM_N - 1}], ' ')
  ))) AS gram
  FROM documents
),
bench AS (
  SELECT DISTINCT doc_id AS bench_doc, gram FROM grams
  WHERE doc_id % {BENCH_MOD} = 0
),
hits AS (
  SELECT DISTINCT g.doc_id, g.source, g.gram
  FROM grams g JOIN bench b ON g.gram = b.gram
  WHERE g.doc_id != b.bench_doc
)
SELECT source, COUNT(DISTINCT doc_id) AS contaminated_docs,
       COUNT(*) AS contaminated_grams
FROM hits GROUP BY source ORDER BY source
"""

# -- bloom-prefiltered contamination ----------------------------------------

BLOOM_BITS_PER_KEY = 16  # m/n=16, k=11 → ~5e-4 false-positive rate
BLOOM_K = 11


def _bloom_positions(gram: str, m_mask: int):
    """The k bit positions of ``gram`` in an m-bit bloom (m a power
    of two, ``m_mask = m-1``): double hashing over the two md5
    halves, h2 forced odd so the k probes never collapse. Build and
    probe share THIS one function — no cross-engine hash parity is
    even needed, because bloom false positives are removed by an
    exact recheck and false negatives are impossible."""
    import hashlib

    d = hashlib.md5(gram.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [((h1 + i * h2) & 0x7FFFFFFFFFFFFFFF) & m_mask for i in range(BLOOM_K)]


def contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C52: benchmark decontamination via a BROADCAST BLOOM
    prefilter + exact recheck — the zero-shuffle 100 TB shape of
    ``contamination_check`` (same grams, same aggregate, and — since
    a bloom filter has no false negatives and the recheck join
    removes its false positives — the EXACT same result, so it
    shares CONTAMINATION_SQL).

    Why this operator exists next to the plain equi-join: at 100 TB
    the corpus side of contamination_check materializes every corpus
    gram as a JVM row feeding a join (~10^12 rows even though the
    bench side broadcasts). Here the corpus grams never leave the
    Arrow worker that shingled them: each is probed against a
    broadcast fixed-size bitmap (16 bits/key — a 1M-gram benchmark
    is a 2 MB bitmap, vs a multi-GB broadcast hash table of gram
    strings) and only the ~5e-4 false-positive fraction plus the
    true hits ever become rows. The exact recheck join then runs on
    that ε-sized candidate set against the tiny bench gram table.
    This bloom-prefilter + exact-recheck composition is the same
    proven-lossless pattern as embedding_neardup's BLAS prefilter.

    Scale ledger: corpus — ONE scan, no shuffle (probe output is
    candidates only); bench slice — two small shuffles (bitmap OR +
    recheck build side); driver — m/64 int64 words (the bitmap),
    never gram strings. Reference anchor: the reference's DuckDB
    core ships the same idea as JoinFilterPushdown/bloom on hash
    joins; here it is lifted to the shingle layer where the 100 TB
    win actually is."""
    import numpy as np
    import pandas as pd

    from ..materialize import spill_to_parquet
    from .dedup import _gram_rows

    docs = load(spark, sf_dir, "documents")
    bench_docs = docs.where(F.col("doc_id") % BENCH_MOD == 0)
    # the bench gram table is consumed THREE times (bitmap sizing,
    # bitmap build, exact recheck) and the doc_id % BENCH_MOD filter
    # is not parquet-prunable — spill the shingled slice once so the
    # documents table is scanned once for it, not three times
    bench = spill_to_parquet(
        _gram_rows(bench_docs, [], _word_ngrams(CONTAM_N), "gram").select(
            F.col("doc_id").alias("bench_doc"), "gram"
        ),
        label="benchgrams",
    )

    # size the bitmap off the bench gram count (a count of the spill),
    # then build it DISTRIBUTED: workers emit per-batch OR-partials of
    # 64-bit words, one groupBy(word_idx) bit_or reduces them, and the
    # driver collects only m/64 words.
    n_keys = bench.count()
    m_bits = 1 << max(10, (int(n_keys) * BLOOM_BITS_PER_KEY).bit_length())
    m_mask = m_bits - 1

    def or_partials(batches):
        for pdf in batches:
            words: dict[int, int] = {}
            for gram in pdf["gram"]:
                for pos in _bloom_positions(gram, m_mask):
                    words[pos >> 6] = words.get(pos >> 6, 0) | (
                        1 << (pos & 63)
                    )
            # 64-bit words travel as SIGNED int64 (Arrow/Spark long):
            # a same-bytes view, not a value cast — bit_or is
            # sign-agnostic and the driver masks back to unsigned
            yield pd.DataFrame(
                {
                    "word_idx": np.array(list(words), dtype=np.int64),
                    "bits": np.array(
                        list(words.values()), dtype=np.uint64
                    ).view(np.int64),
                }
            )

    word_rows = (
        bench.select("gram")
        .mapInPandas(or_partials, "word_idx long, bits long")
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
        .collect()
    )
    bitmap = np.zeros(m_bits >> 6, dtype=np.uint64)
    for r in word_rows:
        bitmap[r["word_idx"]] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    bc = spark.sparkContext.broadcast((bitmap, m_mask))

    def probe(batches):
        bmp, mask = bc.value
        for pdf in batches:
            out_doc, out_src, out_gram = [], [], []
            for did, src, txt in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                gs = _word_ngrams(CONTAM_N)(txt)
                if not gs:
                    continue
                for g in gs:
                    hit = True
                    for pos in _bloom_positions(g, mask):
                        if not (
                            int(bmp[pos >> 6]) >> (pos & 63)
                        ) & 1:
                            hit = False
                            break
                    if hit:
                        out_doc.append(did)
                        out_src.append(src)
                        out_gram.append(g)
            yield pd.DataFrame(
                {"doc_id": out_doc, "source": out_src, "gram": out_gram}
            ).astype({"doc_id": "int64"})

    corpus = docs.select("doc_id", "source", "text")
    candidates = _spread(corpus).mapInPandas(
        probe, "doc_id long, source string, gram string"
    )
    # exact recheck: candidates are true-hits + ~5e-4 false positives;
    # the join against the real bench gram table (broadcast — it is
    # the small side by construction) removes the latter, restoring
    # exact equality with contamination_check.
    hits = (
        candidates.join(F.broadcast(bench), "gram")
        .where(F.col("doc_id") != F.col("bench_doc"))
        .select("doc_id", "source", "gram")
        .distinct()
    )
    return (
        hits.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("contaminated_docs"),
            F.count(F.lit(1)).alias("contaminated_grams"),
        )
        .orderBy("source")
    )


# -- repetition filter ------------------------------------------------------

REP_N = 2  # bigrams: word-salad corpora repeat these measurably


def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate: fraction of duplicate word
    bigrams inside each doc. The flag threshold (dup fraction > 0.2)
    is evaluated in INTEGER arithmetic — ``(total - distinct)*5 >
    total`` — so there is no float boundary to disagree on between
    engines.

    The distinct-bigram count runs as an Arrow-batched
    ``mapInPandas`` with per-batch partial aggregation by source:
    measured at sf1, a Python set-of-pairs is 3× faster (4.9s vs
    13.7s) than the JVM higher-order-function chain
    (transform+slice+concat_ws lambdas are interpreted per element,
    not codegen'd), and the manual map-side combine means only a few
    rows per batch ever shuffle. Linear scan, no join — the 100 TB
    shape is unchanged."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents")

    def rep_stats(batches):
        for pdf in batches:
            rows: dict[str, list[int]] = {}
            for src, txt in zip(pdf["source"], pdf["text"]):
                if txt is None:
                    # oracle's WHERE len(...) > 0 drops NULL rows
                    # (NULL comparison); match instead of crashing
                    continue
                # strip(" ") not strip(): Spark/DuckDB trim() removes
                # only spaces, Python's bare strip() all whitespace
                w = txt.strip(" ").split(" ")
                total = len(w) - (REP_N - 1)
                if total <= 0:
                    continue
                distinct = len(set(zip(*(w[i:] for i in range(REP_N)))))
                acc = rows.setdefault(src, [0, 0, 0, 0])
                acc[0] += 1
                acc[1] += 1 if (total - distinct) * 5 > total else 0
                acc[2] += total
                acc[3] += distinct
            yield pd.DataFrame(
                [(s, *a) for s, a in rows.items()],
                columns=[
                    "source",
                    "n_docs",
                    "n_flagged",
                    "total_grams",
                    "distinct_grams",
                ],
            )

    partials = docs.select("source", "text").mapInPandas(
        rep_stats,
        "source string, n_docs long, n_flagged long, "
        "total_grams long, distinct_grams long",
    )
    return (
        partials.groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_flagged").alias("n_flagged"),
            F.sum("total_grams").alias("total_grams"),
            F.sum("distinct_grams").alias("distinct_grams"),
        )
        .orderBy("source")
    )


REPETITION_SQL = f"""
WITH per_doc AS (
  SELECT doc_id, source,
    len(string_split(trim(text), ' ')) - {REP_N - 1} AS total,
    len(list_distinct(list_transform(
      range(1, len(string_split(trim(text), ' ')) - {REP_N - 2}),
      i -> array_to_string(string_split(trim(text), ' ')[i:i+{REP_N - 1}], ' ')
    ))) AS distinct_
  FROM documents
  WHERE len(string_split(trim(text), ' ')) - {REP_N - 1} > 0
)
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN (total - distinct_) * 5 > total THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
  CAST(SUM(total) AS BIGINT) AS total_grams,
  CAST(SUM(distinct_) AS BIGINT) AS distinct_grams
FROM per_doc GROUP BY source ORDER BY source
"""

# -- sequence packing -------------------------------------------------------

PACK_BUDGET = 1024  # tokens per training sequence


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:  # noqa: D401
    """Greedy first-fit packing of documents into fixed-budget
    training sequences (context-window packing), per source, in
    doc_id order: a doc goes into the current sequence if it fits,
    else it opens a new one (oversize docs get their own).

    The greedy fold is inherently sequential PER SOURCE, so it runs
    as ``applyInPandas`` over source groups — each group is one
    Arrow batch on one executor; sources parallelize across the
    cluster. Deterministic: same input → same packing, any engine —
    which is why it can be oracle-checked at all (DuckDB recursive
    CTE computes the identical fold)."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()  # size(split(NULL)) = -1; oracle NULLs
    )
    toks = docs.select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).alias("tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas guarantees exactly ONE source per call —
        # emit its single summary row directly
        pdf = pdf.sort_values("doc_id")
        seq_idx, fill = 0, None
        for tok in pdf["tok"]:
            if fill is None or fill + tok > PACK_BUDGET:
                seq_idx += 1
                fill = tok
            else:
                fill += tok
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(pdf)],
                "n_sequences": [seq_idx],
                "total_tokens": [int(pdf["tok"].sum())],
            }
        )

    return (
        toks.groupBy("source")
        .applyInPandas(
            pack,
            schema="source string, n_docs long, n_sequences long, "
            "total_tokens long",
        )
        .orderBy("source")
    )


SEQUENCE_PACKING_SQL = f"""
WITH RECURSIVE docs_o AS (
  SELECT source, doc_id,
    len(string_split(trim(text), ' ')) AS tok,
    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
  WHERE text IS NOT NULL
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

# -- domain mixture ---------------------------------------------------------


def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the language mixture by deterministic downsampling:
    every language is sampled down toward the SMALLEST language's
    count. The per-lang keep-threshold is computed in integer
    arithmetic (bp out of 10000), and membership is the same
    md5-hash rule as stratified_sample — reproducible across engines
    and re-runs, the property a re-materializable 100 TB corpus
    needs. One per-lang aggregate (min attached via a global window
    over the tiny aggregated frame), one corpus scan."""
    docs = load(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    # min over the aggregate as a GLOBAL window, not
    # crossJoin(broadcast(per_lang.agg(min))): the separate-aggregate
    # shape re-ran the full per-lang count scan for the MIN branch
    # (the join side's pushed IsNotNull(lang) broke exchange
    # canonicalization, so neither ReuseExchange nor AQE stage reuse
    # fired — two lang-column corpus scans per call). The window
    # consumes the one aggregated frame (rows = #languages); the
    # lang IS NOT NULL join filter cannot push below an unpartitioned
    # window, so min_n still ranges over every group incl. a NULL
    # lang group — same value as the oracle's scalar subquery.
    # integer division end-to-end: double-divide + cast diverges
    # between engines (Spark truncates, DuckDB rounds) at sf1 ratios
    rates = per_lang.withColumn(
        "min_n", F.min("n_lang").over(Window.partitionBy())
    ).select(
        "lang",
        F.expr("(10000 * min_n) div n_lang").alias("keep_bp"),
    )
    bucket = doc_bucket()
    kept = (
        docs.join(rates, "lang")
        .where(bucket % 10_000 < F.col("keep_bp"))
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("lang")
    )


DOMAIN_MIX_SQL = f"""
WITH per_lang AS (
  SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
),
rates AS (
  SELECT lang,
    (10000 * (SELECT MIN(n_lang) FROM per_lang)) // n_lang AS keep_bp
  FROM per_lang
)
SELECT d.lang AS lang, COUNT(*) AS n_kept,
  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {SQL_DOC_BUCKET}
      % 10000 < r.keep_bp
GROUP BY d.lang ORDER BY d.lang
"""

def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C40: temperature-based language rebalancing — the standard
    multilingual-pretraining mixer (mT5/XLM-R style): language
    shares are flattened toward uniform by sampling documents of
    language *l* at rate (n_min/n_l)^(1-alpha). alpha=1 keeps the
    natural distribution, alpha=0 is the full rebalance-to-minimum
    (exactly ``domain_mix``); alpha=0.5 here. Deterministic md5
    bucketing (same rule as stratified_sample/domain_mix) so the
    resample is reproducible across engines and re-runs.

    Float discipline: the keep threshold is
    floor(sqrt((1e8 * n_min) / n_l)) basis points — multiply,
    divide, sqrt and floor are all IEEE correctly-rounded, so both
    engines compute the identical integer threshold (1e8*n_min stays
    exact below 2^53). One per-lang aggregate (min via a global
    window over the tiny aggregated frame), one corpus scan; at
    100 TB this is a metadata-cheap filter."""
    docs = load(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    # rate = (n_min/n_l)^(1-0.5) = sqrt(n_min/n_l), in basis points.
    # min_n as a global window over the one aggregated frame — same
    # dedup-the-aggregate-scan rationale as domain_mix above (the
    # crossJoin(broadcast(agg)) shape ran the per-lang count twice).
    rates = per_lang.withColumn(
        "min_n", F.min("n_lang").over(Window.partitionBy())
    ).select(
        "lang",
        "n_lang",
        F.floor(
            F.sqrt(
                F.lit(100000000).cast("double")
                * F.col("min_n")
                / F.col("n_lang")
            )
        ).alias("keep_bp"),
    )
    bucket = doc_bucket()
    kept = docs.join(rates, "lang").where(
        bucket % 10_000 < F.col("keep_bp")
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.max("n_lang").alias("n_before"),
            F.count(F.lit(1)).alias("n_kept"),
            F.max("keep_bp").alias("keep_bp"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("lang")
    )


TEMPERATURE_RESAMPLE_SQL = f"""
WITH per_lang AS (
  SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
),
rates AS (
  SELECT lang, n_lang,
    CAST(FLOOR(SQRT((CAST(100000000 AS DOUBLE)
                     * (SELECT MIN(n_lang) FROM per_lang)) / n_lang))
         AS BIGINT) AS keep_bp
  FROM per_lang
)
SELECT d.lang AS lang,
  CAST(MAX(r.n_lang) AS BIGINT) AS n_before,
  COUNT(*) AS n_kept,
  CAST(MAX(r.keep_bp) AS BIGINT) AS keep_bp,
  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {SQL_DOC_BUCKET}
      % 10000 < r.keep_bp
GROUP BY d.lang ORDER BY d.lang
"""


# -- cross-source overlap ---------------------------------------------------


def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance dedup matrix: for each PAIR of sources, how many
    bag-of-words fingerprints (md5 of the sorted distinct word set)
    they share — where a crawl pipeline finds mirror sites and
    templated boilerplate re-crawled under different hosts. Keyed
    equi-join on the md5 fingerprint: work is bounded by duplicate
    groups, never pairwise over docs."""
    bow_fp = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), " "))
            ),
        )
    )
    docs = (
        load(spark, sf_dir, "documents")
        # NULL text: Spark concat_ws over a NULL array yields '' (so
        # NULL docs would all share md5('') and spuriously join);
        # the oracle's array_to_string(NULL) stays NULL and drops
        # them — align by dropping in both engines
        .where(F.col("text").isNotNull())
        .select("source", bow_fp.alias("fp"))
        .distinct()
    )
    a = docs.select(F.col("source").alias("src_a"), "fp")
    b = docs.select(F.col("source").alias("src_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .orderBy("src_a", "src_b")
    )


CROSS_SOURCE_OVERLAP_SQL = """
WITH fps AS (
  SELECT DISTINCT source,
    md5(array_to_string(list_sort(list_distinct(
      string_split(lower(trim(text)), ' '))), ' ')) AS fp
  FROM documents
  WHERE text IS NOT NULL
)
SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared_fps
FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source ORDER BY src_a, src_b
"""


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split WITHOUT near-dup leakage: the split decision
    is made per duplicate CLUSTER (normalized-text fingerprint), not
    per document, so two copies of one text can never land on
    opposite sides and leak eval data into training. Deterministic:
    side = md5(fingerprint) threshold (≈90/10). Output: per
    (source, split) doc counts + cluster counts, plus the leakage
    audit — clusters spanning both sides — which MUST be zero.

    One fingerprint scan into one hash groupBy, spilled small (one
    row per (cluster, source, split)) so the audit and the summary
    both read it without re-running the scan; at 100 TB the
    fingerprint is already materialized by the dedup pass, making
    this a free rider on that shuffle."""
    
    docs = (
        load(spark, sf_dir, "documents")
        # NULL text → NULL fingerprint: the oracle's join on fp drops
        # those rows; align by dropping in both engines
        .where(F.col("text").isNotNull())
        .select("doc_id", "source", text_fingerprint().alias("fp"))
    )
    # the cluster's split side: decided once from the fingerprint
    # (first two hex digits -> 0..255, ~90/10 by mod 10)
    side = F.when(
        F.conv(F.substring(F.col("fp"), 1, 2), 16, 10).cast("long") % 10
        < 9,
        "train",
    ).otherwise("val")
    # r5 perf restructure: the expensive part is the full-text
    # fingerprint scan — aggregate it ONCE to (fp, source) cluster
    # rows and derive the assignment, the leakage audit, and the
    # summary all from that small frame (one scan + one shuffle the
    # branches reuse, instead of an eager audit action that re-ran
    # the scan: sf1 11.6s -> ~3s). The audit still counts clusters
    # whose assigned sides disagree, and must stay zero.
    # the side is assigned at DOC level so the audit below checks the
    # per-document assignment (a regression that keys the side on a
    # doc attribute instead of the cluster fingerprint fires it) —
    # deriving the side after the fp groupBy would make the audit
    # structurally zero and self-certifying (r5 review finding)
    tagged = docs.withColumn("split", side)
    # r14: the "one scan the branches reuse" intent above had silently
    # broken — the leak branch prunes `n`/`source` out of the
    # aggregate, so the two consumers' exchanges no longer
    # canonicalize and the executed plan ran the full text+md5
    # fingerprint scan TWICE (verified: two FileScan [text,...] with
    # zero reuse). Spill the narrow (fp, source, split, n) cluster
    # frame — one fingerprint scan, both branches read the spill
    # (strings + longs roundtrip exactly).
    from ..materialize import spill_to_parquet

    per = spill_to_parquet(
        tagged.groupBy("fp", "source", "split").agg(
            F.count(F.lit(1)).alias("n")
        ),
        "leakage-per",
    )
    leak = (
        per.groupBy("fp")
        .agg(F.countDistinct("split").alias("n_sides"))
        .where(F.col("n_sides") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("leaked_clusters"))
    )
    return (
        per.groupBy("source", "split")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.countDistinct("fp").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leak))
        .orderBy("source", "split")
    )


LEAKAGE_SAFE_SPLIT_SQL = f"""
WITH docs AS (
  SELECT doc_id, source,
         {SQL_FINGERPRINT} AS fp
  FROM documents
  WHERE text IS NOT NULL
),
sides AS (
  SELECT fp,
    CASE WHEN ((strpos('0123456789abcdef', substr(fp, 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(fp, 2, 1)) - 1)) % 10 < 9
         THEN 'train' ELSE 'val' END AS split
  FROM (SELECT DISTINCT fp FROM docs)
)
SELECT d.source, s.split, COUNT(*) AS n_docs,
  COUNT(DISTINCT d.fp) AS n_clusters,
  CAST(0 AS BIGINT) AS leaked_clusters
FROM docs d JOIN sides s ON d.fp = s.fp
GROUP BY d.source, s.split ORDER BY source, split
"""


BOILERPLATE_MIN_DF = 5


def boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate detection: explode documents into
    lines (sentence-ish segments split on '. '), count each
    normalized line's document frequency within its source, and
    report per-source boilerplate pressure — lines repeated across
    ≥ BOILERPLATE_MIN_DF docs are navigation chrome / templates /
    legal footers that a crawl pipeline strips before training.
    Shapes: one explode (linear), one (source, line-hash) groupBy —
    uniform md5 keys, map-side partial agg; no joins back to the
    corpus, so the heavy text column never shuffles."""
    docs = load(spark, sf_dir, "documents")
    lines = docs.select(
        "source",
        "doc_id",
        F.explode(F.split(F.col("text"), "\\. ")).alias("line"),
    ).select(
        "source",
        "doc_id",
        F.md5(F.lower(F.trim(F.col("line")))).alias("lh"),
    ).where(F.length(F.trim(F.col("line"))) > 0).distinct()
    line_df = lines.groupBy("source", "lh").agg(
        F.count(F.lit(1)).alias("line_docs")
    )
    return (
        line_df.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("line_docs") >= BOILERPLATE_MIN_DF, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_boilerplate"),
            F.max("line_docs").alias("max_line_df"),
        )
        .orderBy("source")
    )


BOILERPLATE_LINES_SQL = f"""
WITH lines AS (
  SELECT DISTINCT source, doc_id,
         md5(lower(trim(line))) AS lh
  FROM (
    SELECT source, doc_id, unnest(string_split(text, '. ')) AS line
    FROM documents
  )
  WHERE len(trim(line)) > 0
),
line_df AS (
  SELECT source, lh, COUNT(*) AS line_docs
  FROM lines GROUP BY source, lh
)
SELECT source, COUNT(*) AS n_lines,
  CAST(SUM(CASE WHEN line_docs >= {BOILERPLATE_MIN_DF} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_boilerplate,
  MAX(line_docs) AS max_line_df
FROM line_df GROUP BY source ORDER BY source
"""


QUERIES = {
    "contamination_check": contamination_check,
    "contamination_bloom": contamination_bloom,
    "repetition_filter": repetition_filter,
    "sequence_packing": sequence_packing,
    "domain_mix": domain_mix,
    "temperature_resample": temperature_resample,
    "cross_source_overlap": cross_source_overlap,
    "leakage_safe_split": leakage_safe_split,
    "boilerplate_lines": boilerplate_lines,
}

ORACLE = {
    "contamination_check": CONTAMINATION_SQL,
    # bloom prefilter + exact recheck is lossless — shares the oracle
    "contamination_bloom": CONTAMINATION_SQL,
    "repetition_filter": REPETITION_SQL,
    "sequence_packing": SEQUENCE_PACKING_SQL,
    "domain_mix": DOMAIN_MIX_SQL,
    "temperature_resample": TEMPERATURE_RESAMPLE_SQL,
    "cross_source_overlap": CROSS_SOURCE_OVERLAP_SQL,
    "leakage_safe_split": LEAKAGE_SAFE_SPLIT_SQL,
    "boilerplate_lines": BOILERPLATE_LINES_SQL,
}
