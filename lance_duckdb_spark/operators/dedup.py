"""Deduplication operators for training-data pipelines (SURVEY.md
§2.C1-C4): exact, MinHash+LSH, SimHash, and n-gram Jaccard.

Design for 100 TB:
- Exact dedup is a hash-groupBy — one shuffle on a 16-byte digest,
  map-side partial aggregation, no skew (hashes are uniform).
- MinHash+LSH: shingling is an Arrow-batched mapInPandas (r6 —
  measured ~3x over the interpreted JVM higher-order-function
  chain); the 32 hash lanes stay ``md5`` built-ins (JVM codegen).
  The LSH band join
  is an *equi-join* on (band_idx, band_hash): the only pairs that
  ever shuffle are bucket collisions, never the O(n²) cross
  product — this is the property that survives a billion documents.
  Candidates are then verified with exact Jaccard.
- SimHash: 64-bit signature from per-token md5 nibbles; candidate
  pairs via 4-block LSH (hamming ≤3 ⇒ at least one of 4 16-bit
  blocks equal, pigeonhole), verified with exact hamming distance.
- Determinism: every hash is md5-of-string, every tie is broken
  explicitly, so the DuckDB oracle can replicate the *same
  algorithm* and match bit-for-bit. (A separate pytest asserts
  MinHash recall against exact Jaccard — the oracle checks the
  algorithm, the test checks its quality.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..materialize import spill_to_parquet
from ..tables import load
from .common import SQL_FINGERPRINT, text_fingerprint

# ---------------------------------------------------------------- C1


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    # fingerprint the text ONCE (r14 optimization): the cluster
    # aggregate (count + min per h) joined back onto `hashed` built
    # two subtrees whose exchanges differ by projection, so
    # ReuseExchange could not canonicalize them — the executed plan
    # ran the text scan + md5 TWICE. Per-h window aggregates over the
    # one hashed frame compute the same (n, keep_id) per row from ONE
    # text scan and ONE exchange on h, lazily and with no disk. The
    # explicit h-not-null filter preserves the inner join's NULL-h
    # drop (md5 of a NULL text), exactly like the oracle's JOIN.
    hashed = docs.select(
        "doc_id", "source", text_fingerprint().alias("h")
    ).where(F.col("h").isNotNull())
    wh = Window.partitionBy("h")
    per_doc = hashed.withColumn(
        "n", F.count(F.lit(1)).over(wh)
    ).withColumn("keep_id", F.min("doc_id").over(wh))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_distinct"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("long").alias("n_dup_docs"),
            F.sum(F.when(F.col("doc_id") != F.col("keep_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_removable"),
        )
        .orderBy("source")
    )


DEDUP_EXACT_SQL = f"""
WITH hashed AS (
  SELECT doc_id, source,
         {SQL_FINGERPRINT} AS h
  FROM documents
),
clusters AS (
  SELECT h, COUNT(*) AS n, MIN(doc_id) AS keep_id FROM hashed GROUP BY h
)
SELECT source,
  COUNT(*) AS n_docs,
  COUNT(DISTINCT hashed.h) AS n_distinct,
  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
  CAST(SUM(CASE WHEN doc_id != keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_removable
FROM hashed JOIN clusters ON hashed.h = clusters.h
GROUP BY source
ORDER BY source
"""

# ---------------------------------------------------------------- C2

N_HASHES = 32
N_BANDS = 8  # 8 bands x 4 rows
ROWS_PER_BAND = N_HASHES // N_BANDS
MINHASH_JACCARD_T = 0.2


def _gram_rows(
    docs: DataFrame,
    extra_cols: list[str],
    grams_of,
    out_col: str,
) -> DataFrame:
    """Shared Arrow-batched shingling scaffold: one output row per
    (doc, distinct gram), with ``extra_cols`` carried through.

    mapInPandas, not a JVM transform(sequence, ...) chain:
    higher-order-function lambdas are interpreted per element, not
    codegen'd — the Python set-based grammers measured 3-4x faster
    at sf0.1-sf1 with identical rows out (so every downstream md5
    lane and oracle hash is unchanged). ``grams_of(text)`` returns
    the doc's distinct-gram set, or falsy to drop the doc (NULL /
    too-short text — the oracles' length gates do the same). The
    guarded spread below fans an under-partitioned scan out to the
    session's parallelism (driver parquet is one row group); a scan
    already yielding >= cores splits runs shuffle-free.
    """
    import pandas as pd

    schema = ", ".join(
        ["doc_id long"]
        + [f"{c} string" for c in extra_cols]
        + [f"{out_col} string"]
    )

    def _run(batches):
        for pdf in batches:
            acc: dict[str, list] = {
                c: [] for c in ["doc_id", *extra_cols, out_col]
            }
            for row in zip(
                pdf["doc_id"], *(pdf[c] for c in extra_cols), pdf["text"]
            ):
                did, extras, txt = row[0], row[1:-1], row[-1]
                gs = grams_of(txt)
                if not gs:
                    continue
                acc["doc_id"].extend([did] * len(gs))
                for c, v in zip(extra_cols, extras):
                    acc[c].extend([v] * len(gs))
                acc[out_col].extend(gs)
            yield pd.DataFrame(acc)

    from .common import spread

    # guarded spread (r14, the fts._spread discipline): round-robin
    # repartition ONLY when the scan is under-partitioned for the
    # session (driver parquet is one row group). The previous
    # unconditional repartition shuffled the full text column even
    # on a corpus already laid out across >= cores splits — a pure
    # overhead exchange at scale. Output rows are per-doc and
    # partitioning-independent, so results are unchanged.
    return spread(
        docs.select("doc_id", *extra_cols, "text")
    ).mapInPandas(_run, schema)


def _word3_grams(txt):
    """DISTINCT word 3-shingles, mirroring the JVM/oracle semantics
    exactly: trim strips SPACES only, split(" ") keeps empty tokens
    between consecutive spaces, <3-token (and NULL) docs drop — the
    oracle's string_split(trim(text), ' ') does the same."""
    if txt is None:
        return None
    words = txt.strip(" ").split(" ")
    if len(words) < 3:
        return None
    return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}


def _shingle_df(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle): distinct word 3-shingles — feeds minhash
    LSH, containment, incremental dedup, and pair verification."""
    return _gram_rows(docs, [], _word3_grams, "shingle")


def _minhash_signatures(shingled: DataFrame) -> DataFrame:
    """32 md5 lanes: minhash_i = min(md5(i || ':' || shingle))."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"m{i}")
        for i in range(N_HASHES)
    ]
    return shingled.groupBy("doc_id").agg(*aggs)


def _band_hashes(sig: DataFrame) -> DataFrame:
    """Unpivot 8 band digests to (doc_id, band_idx, band_hash) rows."""
    bands = []
    for b in range(N_BANDS):
        cols = [F.col(f"m{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        bands.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat(*cols)).alias("band_hash"))
        )
    return sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_hash")


def _lsh_candidates(bands: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs colliding in at least one LSH
    band — the equi-join that bounds every minhash operator's pair
    count (never all-pairs). One definition shared by dedup,
    containment, and (structurally) the incremental/streaming
    store joins."""
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_hash")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..materialize import spill_to_parquet

    docs = load(spark, sf_dir, "documents")
    # shingle ONCE: the signature path and the verification's three
    # consumers (sizes, sa, sb) are distinct plan subtrees, so
    # without a spill Spark re-runs the full-corpus Arrow shingling
    # four times per query (r8 review finding; ~5s/pass at sf1)
    shingled = spill_to_parquet(_shingle_df(docs), "shingles")
    cand = _lsh_candidates(_band_hashes(_minhash_signatures(shingled)))
    # verify candidates with exact Jaccard over distinct shingles
    return verify_candidate_pairs(cand, docs, shingled=shingled)


def _minhash_cand_cte() -> str:
    """Shared WITH-body: shingles → signatures → bands → candidate
    pairs → sizes → intersections. Reused by the Jaccard and the
    containment oracles (one definition, two scoring finals)."""
    mins = ",\n      ".join(
        f"MIN(md5('{i}:' || shingle)) AS m{i}" for i in range(N_HASHES)
    )
    band_rows = []
    for b in range(N_BANDS):
        cols = " || ".join(
            f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
        )
        band_rows.append(f"SELECT doc_id, {b} AS band_idx, md5({cols}) AS band_hash FROM sig")
    bands_union = "\n    UNION ALL\n    ".join(band_rows)
    return f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, len(string_split(trim(text), ' ')) - 1),
    i -> string_split(trim(text), ' ')[i] || ' ' ||
         string_split(trim(text), ' ')[i+1] || ' ' ||
         string_split(trim(text), ' ')[i+2]))) AS shingle
  FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 3
),
sig AS (
  SELECT doc_id, {mins}
  FROM sh GROUP BY doc_id
),
bands AS (
    {bands_union}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)"""


def _minhash_sql() -> str:
    return (
        _minhash_cand_cte()
        + f"""
SELECT i.doc_a, i.doc_b,
  CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) >= {MINHASH_JACCARD_T}
ORDER BY doc_a, doc_b
"""
    )


DEDUP_MINHASH_SQL = _minhash_sql()

# ---------------------------------------------------------------- C3

SIMHASH_BLOCKS = 4
BITS_PER_BLOCK = 16
HAMMING_T = 3
_HEXMAP = "0123456789abcdef"


def _nibble_val(hexcol: Column, pos: int) -> Column:
    """Value 0..15 of the hex digit at 1-based position pos."""
    return F.instr(F.lit(_HEXMAP), F.substring(hexcol, pos, 1)) - 1


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The wide per-bit expressions are generated SQL strings fed to
    # selectExpr/F.expr: building them as Column objects costs one
    # py4j round-trip per operator node (~2.5 s of pure driver time
    # for the 64-bit trees at r4 profiling) while a generated string
    # is parsed JVM-side in one call. Per-row work is also trimmed:
    # each of the 16 hex nibbles is decoded ONCE in a projection,
    # not once per bit lookup.
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), " ")
    toks = docs.select(
        "doc_id", F.explode(words).alias("tok")
    ).withColumn("th", F.md5(F.col("tok")))
    nibbles = toks.selectExpr(
        "doc_id",
        *[
            f"instr('{_HEXMAP}', substring(th, {d + 1}, 1)) - 1 AS n{d}"
            for d in range(16)
        ],
    )
    # Per-bit set-counts packed two-per-bigint in 32-bit lanes: 33
    # aggregate slots instead of the 64 ±1 vote sums of the naive
    # formulation. Lanes cannot interact: every contribution is
    # non-negative and a lane's total is the doc's token count,
    # which is < 2^31 for any row Spark can hold (a string column
    # caps at 2 GB). Bit b's vote sum v = 2*count_b - n_toks, so
    # sign(v) > 0  ⇔  2*count_b > n_toks — the unpacked oracle SQL
    # keeps the ±1 form and stays hash-identical.

    def bit(k: int) -> str:  # 0/1 of global bit k, MSB-first per nibble
        return f"cast((n{k // 4} & {1 << (3 - k % 4)}) > 0 as bigint)"

    aggs = [
        F.expr(
            f"sum({bit(2 * j)} * {1 << 32} + {bit(2 * j + 1)}) AS p{j}"
        )
        for j in range(32)
    ]
    votes = nibbles.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"), *aggs
    )

    def count_of(k: int) -> str:
        return (
            f"shiftright(p{k // 2}, 32)"
            if k % 2 == 0
            else f"(p{k // 2} & {(1 << 32) - 1})"
        )

    block_exprs = []
    for blk in range(SIMHASH_BLOCKS):
        terms = " + ".join(
            f"if(2 * {count_of(blk * BITS_PER_BLOCK + i)} > n_toks, "
            f"{1 << (BITS_PER_BLOCK - 1 - i)}, 0)"
            for i in range(BITS_PER_BLOCK)
        )
        block_exprs.append(f"({terms}) AS b{blk}")
    sig = votes.selectExpr("doc_id", *block_exprs)
    # Carry the whole 4-block signature on each exploded block row so
    # the band self-join yields BOTH sides' signatures directly — the
    # naive shape re-joined sig on doc_id twice, recomputing the full
    # tokenize→vote pipeline three times inside one plan (no common-
    # subtree reuse across different join keys; measured 3× the vote
    # stage at sf0.1). Here the pipeline runs once per join side and
    # the two sides' shuffles canonicalize identically, so
    # ReuseExchange makes it once overall. Row widening is 4 bigints
    # — noise next to a shuffle row's base cost.
    blocks = sig.select(
        "doc_id",
        *[f"b{i}" for i in range(SIMHASH_BLOCKS)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_idx"), F.col(f"b{b}").alias("block_val")
                    )
                    for b in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("blk"),
    ).select(
        "doc_id",
        *[f"b{i}" for i in range(SIMHASH_BLOCKS)],
        "blk.block_idx",
        "blk.block_val",
    )
    a = blocks.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(SIMHASH_BLOCKS)],
        "block_idx",
        "block_val",
    )
    b = blocks.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{i}").alias(f"bb{i}") for i in range(SIMHASH_BLOCKS)],
        "block_idx",
        "block_val",
    )
    hamming = None
    for i in range(SIMHASH_BLOCKS):
        h = F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"bb{i}")))
        hamming = h if hamming is None else hamming + h
    return (
        a.join(b, ["block_idx", "block_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= HAMMING_T)
        .orderBy("doc_a", "doc_b")
    )


def _simhash_sql() -> str:
    vote_exprs = []
    for blk in range(SIMHASH_BLOCKS):
        idx = 0
        for d in range(4):
            pos = blk * 4 + d + 1
            for bit in range(4):
                mask = 1 << (3 - bit)
                vote_exprs.append(
                    f"SUM(CASE WHEN (strpos('{_HEXMAP}', substr(th, {pos}, 1)) - 1) & {mask} > 0 "
                    f"THEN 1 ELSE -1 END) AS v{blk}_{idx}"
                )
                idx += 1
    votes = ",\n      ".join(vote_exprs)
    block_cols = []
    for blk in range(SIMHASH_BLOCKS):
        terms = " + ".join(
            f"(CASE WHEN v{blk}_{i} > 0 THEN 1 ELSE 0 END) * {1 << (BITS_PER_BLOCK - 1 - i)}"
            for i in range(BITS_PER_BLOCK)
        )
        block_cols.append(f"({terms}) AS b{blk}")
    blocks_union = "\n    UNION ALL\n    ".join(
        f"SELECT doc_id, {b} AS block_idx, b{b} AS block_val FROM sig"
        for b in range(SIMHASH_BLOCKS)
    )
    ham = " + ".join(
        f"bit_count(xor(sa.b{i}, sb.b{i}))" for i in range(SIMHASH_BLOCKS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, md5(unnest(string_split(trim(text), ' '))) AS th
  FROM documents
),
votes AS (
  SELECT doc_id, {votes}
  FROM toks GROUP BY doc_id
),
sig AS (
  SELECT doc_id, {', '.join(block_cols)} FROM votes
),
blocks AS (
    {blocks_union}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a JOIN blocks b
    ON a.block_idx = b.block_idx AND a.block_val = b.block_val
   AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, CAST({ham} AS INTEGER) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
WHERE {ham} <= {HAMMING_T}
ORDER BY doc_a, doc_b
"""


DEDUP_SIMHASH_SQL = _simhash_sql()

# ---------------------------------------------------------------- C4

NGRAM_N = 5
NGRAM_JACCARD_T = 0.3
# candidate generation self-joins on (source, gram): a gram present
# in k docs of one source contributes k² join rows, so a single
# stop-gram (" the ") in every doc makes the join quadratic in the
# source size. Grams near-universal within a source carry no Jaccard
# signal — drop any gram with within-source df above this cap BEFORE
# the join (both from the intersection AND from the doc sizes, so the
# score stays a true Jaccard over the kept gram space). The oracle
# mirrors the cap, keeping the comparison hash-exact at any scale.
NGRAM_DF_CAP = 200


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-5-gram Jaccard between same-source doc pairs (source is
    the blocking key; at scale, blocking + the per-gram df cap are
    what bound the pair count)."""
    docs = load(spark, sf_dir, "documents")

    # Arrow-batched char-5-gram shingling (4x the interpreted JVM
    # HOF chain at sf1: 4.9s vs 20.8s) through the shared _gram_rows
    # scaffold. NULL text drops (the oracle's WHERE len(text) >= N
    # does the same via NULL comparison).
    def _char_grams(txt):
        if txt is None:
            return None
        n = len(txt) - NGRAM_N + 1
        if n <= 0:
            return None
        return {txt[i : i + NGRAM_N] for i in range(n)}

    shingled = _gram_rows(docs, ["source"], _char_grams, "gram")
    # ONE keyed shuffle does everything the gram table is needed
    # for: group by (source, gram) collecting the doc list AND the
    # df count together, then df-cap filter on the aggregate. The
    # previous shape (df groupBy, then join the gram table back,
    # then a second collect_list groupBy) shuffled the ~100M-row
    # gram table three times; this shuffles it once (152s -> ~80s
    # at sf1). Deterministic: pair counting sorts each doc list.
    groups = (
        shingled.groupBy("source", "gram")
        .agg(
            F.collect_list("doc_id").alias("docs"),
            F.count(F.lit(1)).alias("gram_docs"),
        )
        .where(F.col("gram_docs") <= NGRAM_DF_CAP)
    )
    # materialize once: two consumers below (sizes + pair stage)
    # would otherwise each re-run the Python shingler and the big
    # shuffle. A parquet spill (not localCheckpoint) so the staged
    # table lives in durable storage, not executor memory — at sf10
    # the executor-storage blocks were what pushed the JVM over the
    # heap, and at cluster scale a lost executor would have made the
    # block unrecoverable mid-query.
    groups = spill_to_parquet(groups, "ngram_groups")
    # per-doc kept-gram counts (Jaccard denominators): explode the
    # capped doc lists — rows = kept (gram, doc) pairs, one narrow
    # column through the shuffle
    sizes = (
        groups.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("sz"))
    )

    # Pair counting WITHOUT materializing the quadratic join: the
    # df-capped (source, gram) groups are tiny (≤ NGRAM_DF_CAP docs),
    # but a gram self-join still emits Σ C(df,2) rows — 222M at sf1 —
    # through a JVM shuffle + hash-agg. Instead collect each group's
    # doc list (one keyed shuffle, rows = distinct kept grams) and
    # expand + partially count the pairs in vectorized numpy inside
    # mapInPandas; only per-partition distinct pairs (bounded by the
    # true co-occurrence structure) reach the final sum. Each pair is
    # PACKED into one int64 (doc_a << 32 | doc_b): np.unique on a
    # single key replaces a two-key lexsort and the shuffle/agg runs
    # on one long column — measured 47s vs 81s for the unpacked
    # variant at sf1. Same keyed shapes, no new blocking key —
    # survives scale-up exactly like the join did, minus its shuffle
    # volume. (Prefix filtering à la PPJoin was measured too: at
    # T=0.3 it prunes only 1.7x before paying a verification join —
    # not worth it; it only wins at high thresholds.)
    import numpy as np
    import pandas as pd

    # Flush the packed-pair buffer to np.unique every ~4M pairs: an
    # Arrow batch of 10k df-capped groups can expand to ~200M pairs,
    # and buffering a whole batch before the first np.unique is what
    # killed the JVM at sf10 (r6 smoke). The flush size also bounds
    # the OUTPUT batch: each yielded frame becomes ONE Arrow record
    # batch on the JVM receive side, and 32 concurrent tasks each
    # landing a 32M-row (~400 MB) batch blew the 24 GiB netty
    # direct-memory ceiling in the r7 smoke — 4M pairs keeps every
    # side (worker RSS, arrow batch, direct pool) at tens of MB per
    # task at any scale. Partial count frames are merged by the
    # downstream groupBy(pk).sum, so chunk size changes memory, not
    # results.
    FLUSH_PAIRS = 4 * 1024 * 1024

    def pair_counts(batches):
        def _flush(parts):
            pk, cnt = np.unique(np.concatenate(parts), return_counts=True)
            return pd.DataFrame({"pk": pk, "pc": cnt})

        for pdf in batches:
            parts, buffered = [], 0
            for arr in pdf["docs"]:
                d = np.sort(np.asarray(arr, dtype=np.int64))
                if len(d) < 2:
                    continue
                if d[-1] >= 1 << 32 or d[0] < 0:
                    # a negative id would corrupt the packed key
                    # silently (sign bits bleed through the shift) —
                    # reject it as loudly as the overflow (r8 review)
                    raise ValueError(
                        "ngram_jaccard packs doc-id pairs into int64; "
                        "doc_id must be in [0, 2^32) (repartition ids "
                        "or use the unpacked two-column variant)"
                    )
                ii, jj = np.triu_indices(len(d), k=1)
                parts.append((d[ii] << 32) | d[jj])
                buffered += parts[-1].size
                if buffered >= FLUSH_PAIRS:
                    yield _flush(parts)
                    parts, buffered = [], 0
            if parts:
                yield _flush(parts)

    # the grouped table is tiny in BYTES (≤ cap doc-ids per row) but
    # quadratic in WORK per row — AQE's size-based coalescing would
    # funnel it into one task; spread rows round-robin instead
    par = groups.sparkSession.sparkContext.defaultParallelism
    inter = (
        groups.select("docs")
        .repartition(max(32, par))
        .mapInPandas(pair_counts, schema="pk long, pc long")
        .groupBy("pk")
        .agg(F.sum("pc").alias("n_inter"))
        .select(
            F.shiftright("pk", 32).alias("doc_a"),
            F.expr("pk & 4294967295").alias("doc_b"),
            "n_inter",
        )
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= NGRAM_JACCARD_T)
        .orderBy("doc_a", "doc_b")
    )


NGRAM_JACCARD_SQL = f"""
WITH sh0 AS (
  SELECT doc_id, source, unnest(list_distinct(list_transform(
    range(1, len(text) - {NGRAM_N - 2}),
    i -> substr(text, i, {NGRAM_N})))) AS gram
  FROM documents
  WHERE len(text) >= {NGRAM_N}
),
keep AS (
  SELECT source, gram FROM sh0 GROUP BY source, gram
  HAVING COUNT(*) <= {NGRAM_DF_CAP}
),
sh AS (
  SELECT sh0.doc_id, sh0.source, sh0.gram
  FROM sh0 JOIN keep ON sh0.source = keep.source AND sh0.gram = keep.gram
),
sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b
    ON a.source = b.source AND a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
  CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) >= {NGRAM_JACCARD_T}
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------- incremental


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup against a PERSISTED signature store
    — the shape a production ingestion pipeline actually runs: the
    base corpus's band hashes are computed once and stored as a
    lance dataset; each arriving batch computes signatures only for
    ITSELF and equi-joins the store to find cross-corpus duplicates.
    At 100 TB the per-batch cost is O(batch + collisions),
    independent of corpus size — nothing about the base corpus is
    recomputed, and the store itself grows by plain appends.

    Here: base = even doc_ids (store), batch = odd doc_ids;
    candidates are (base, batch) band-bucket collisions verified
    with exact Jaccard ≥ the minhash threshold. Deterministic md5
    lanes ⇒ the oracle replicates the identical algorithm."""
    import os
    import shutil

    from ..sources.datasource import register

    register(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join("/tmp/lance_duckdb_spark", tag, "sigstore.lance")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.dirname(root), exist_ok=True)

    docs = load(spark, sf_dir, "documents")

    # r15 re-cut (r14 VERDICT item 5): spill the narrow MinHash BAND
    # hashes — N_BANDS (doc_id, band_idx, band_hash) rows per doc —
    # instead of the raw shingle frame. The r14 shape's shingle
    # spill was a data-proportional parquet WRITE of the whole
    # shingled corpus, and its own sfd100 A/B measured the write
    # offsetting the Arrow passes it saved (wall-flat). The bands
    # frame is the smallest artifact every signature consumer needs:
    # ONE full-corpus shingle+signature pass at spill time; the
    # store build (even doc_ids) and the batch probe (odd doc_ids)
    # filter the spilled bands by parity — row-identical, because a
    # doc's signature depends only on its own shingles (per-doc
    # groupBy), never on which other docs share the frame. Every md5
    # lane and the oracle hash are unchanged.
    bands_all = spill_to_parquet(
        _band_hashes(_minhash_signatures(_shingle_df(docs))), "bands-inc"
    )

    # one-time (per corpus) signature build, persisted
    bands_all.where(F.col("doc_id") % 2 == 0).write.format(
        "lance"
    ).mode("overwrite").save(root)

    stored = spark.read.format("lance").load(root)
    batch_bands = bands_all.where(F.col("doc_id") % 2 == 1)
    # candidates spilled once (tiny pairs frame): BOTH consumers —
    # the candidate-doc id set below and the verification joins —
    # would otherwise re-run the store⋈batch band join
    cand = spill_to_parquet(
        stored.select(
            F.col("doc_id").alias("doc_a"), "band_idx", "band_hash"
        )
        .join(
            batch_bands.select(
                F.col("doc_id").alias("doc_b"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .select("doc_a", "doc_b")
        .distinct(),
        "cand-inc",
    )
    # exact-Jaccard verification re-shingles ONLY candidate-pair
    # docs: the semi-join sits BELOW the opaque Arrow shingling pass
    # (a predicate cannot push through mapInPandas on its own), so
    # verification is O(candidate docs), not O(corpus). Per-doc
    # shingle sets are unchanged ⇒ identical jaccard doubles.
    ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    return verify_candidate_pairs(
        cand, docs.join(ids, "doc_id", "left_semi")
    )


def _pair_overlap(
    cand: DataFrame, docs: DataFrame, shingled: DataFrame | None = None
) -> DataFrame:
    """(doc_a, doc_b, n_inter, sz_a, sz_b) for candidate pairs —
    inner joins restrict the shingle scan to candidate docs. Shared
    numerator/denominator base for Jaccard AND containment scoring
    (identical arithmetic ⇒ identical doubles across operators).
    ``shingled`` lets a caller that already spilled the shingle
    frame share it; otherwise it is spilled HERE, because the three
    consumers below (sizes, sa, sb) are distinct plan subtrees that
    would each re-run the Arrow shingling (r8 review finding)."""
    if shingled is None:
        from ..materialize import spill_to_parquet

        shingled = spill_to_parquet(_shingle_df(docs), "shingles")
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = shingled.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = shingled.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return inter.join(za, "doc_a").join(zb, "doc_b")


def verify_candidate_pairs(
    cand: DataFrame, docs: DataFrame, shingled: DataFrame | None = None
) -> DataFrame:
    """Exact-Jaccard verification of (doc_a, doc_b) candidate pairs;
    emits pairs ≥ MINHASH_JACCARD_T ordered. Shared by
    dedup_incremental and the streaming incremental dedup job."""
    jac = _pair_overlap(cand, docs, shingled=shingled).select(
        "doc_a",
        "doc_b",
        (
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
        ).alias("jaccard"),
    )
    return jac.where(F.col("jaccard") >= MINHASH_JACCARD_T).orderBy(
        "doc_a", "doc_b"
    )


def _incremental_sql() -> str:
    mins = ",\n      ".join(
        f"MIN(md5('{i}:' || shingle)) AS m{i}" for i in range(N_HASHES)
    )
    band_rows = []
    for b in range(N_BANDS):
        cols = " || ".join(
            f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
        )
        band_rows.append(
            f"SELECT doc_id, {b} AS band_idx, md5({cols}) AS band_hash FROM sig"
        )
    bands_union = "\n    UNION ALL\n    ".join(band_rows)
    return f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, len(string_split(trim(text), ' ')) - 1),
    i -> string_split(trim(text), ' ')[i] || ' ' ||
         string_split(trim(text), ' ')[i+1] || ' ' ||
         string_split(trim(text), ' ')[i+2]))) AS shingle
  FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 3
),
sig AS (
  SELECT doc_id, {mins}
  FROM sh GROUP BY doc_id
),
bands AS (
    {bands_union}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
),
sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
  CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) >= {MINHASH_JACCARD_T}
ORDER BY doc_a, doc_b
"""


DEDUP_INCREMENTAL_SQL = _incremental_sql()


# ------------------------------------------------------- containment

CONTAINMENT_T = 0.5


def minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT over the MinHash-LSH candidate pairs:
    |A∩B|/|A| and |A∩B|/|B| per pair, kept when either side is ≥
    CONTAINMENT_T. Jaccard misses doc-in-doc duplication — a page
    quoted whole inside a much larger page scores low Jaccard but
    containment ≈ 1 on the smaller side; this is the boilerplate /
    quotation / wrapper-page detector a curation pipeline runs next
    to symmetric dedup. Same LSH candidate bound (band equi-join,
    never all-pairs) and the same exact-overlap verification base as
    dedup_minhash_lsh (_pair_overlap)."""
    from ..materialize import spill_to_parquet

    docs = load(spark, sf_dir, "documents")
    # shingle once, shared with verification (same spill rationale as
    # dedup_minhash_lsh)
    shingled = spill_to_parquet(_shingle_df(docs), "shingles")
    cand = _lsh_candidates(_band_hashes(_minhash_signatures(shingled)))
    ov = _pair_overlap(cand, docs, shingled=shingled)
    scored = ov.select(
        "doc_a",
        "doc_b",
        (F.col("n_inter").cast("double") / F.col("sz_a")).alias("cont_a_in_b"),
        (F.col("n_inter").cast("double") / F.col("sz_b")).alias("cont_b_in_a"),
    )
    return scored.where(
        (F.col("cont_a_in_b") >= CONTAINMENT_T)
        | (F.col("cont_b_in_a") >= CONTAINMENT_T)
    ).orderBy("doc_a", "doc_b")


def _containment_sql() -> str:
    return (
        _minhash_cand_cte()
        + f"""
SELECT i.doc_a, i.doc_b,
  CAST(i.n_inter AS DOUBLE) / za.sz AS cont_a_in_b,
  CAST(i.n_inter AS DOUBLE) / zb.sz AS cont_b_in_a
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.n_inter AS DOUBLE) / za.sz >= {CONTAINMENT_T}
   OR CAST(i.n_inter AS DOUBLE) / zb.sz >= {CONTAINMENT_T}
ORDER BY doc_a, doc_b
"""
    )


MINHASH_CONTAINMENT_SQL = _containment_sql()


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "minhash_containment": minhash_containment,
    "dedup_simhash": dedup_simhash,
    "ngram_jaccard": ngram_jaccard,
    "dedup_incremental": dedup_incremental,
}

ORACLE = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
    "minhash_containment": MINHASH_CONTAINMENT_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "ngram_jaccard": NGRAM_JACCARD_SQL,
    "dedup_incremental": DEDUP_INCREMENTAL_SQL,
}
