"""Embedding similarity operators (SURVEY.md §2.C5-C7): near-duplicate
pairs, brute-force ANN top-k, and an IVF-bucketed ANN scale path.

Numeric discipline: cosine is computed as a *sequential left fold*
in doubles — ``F.aggregate`` over ``zip_with`` products — which is
bit-identical to DuckDB's ``list_cosine_similarity(CAST(x AS
DOUBLE[]), ...)`` (verified: 14.5k pairs, 0 ulps apart). No rounding
anywhere; thresholds compare identical doubles in both engines.

Scale notes (100 TB / billions of vectors):
- ``embedding_neardup`` and ``ann_topk_bruteforce`` broadcast the
  smaller side (dedup probes / query set) and stream the big side —
  no shuffle of the vector corpus; exact answers.
- ``ann_ivf`` is the scale path: vectors are assigned to their
  nearest of K deterministic centroids (one broadcast join), probes
  search only the nearest N_PROBE buckets — candidate set is
  corpus/K·N_PROBE per probe, and bucket ids are partition-prunable
  on disk. Recall vs brute force is asserted in tests (≥0.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..materialize import spill_to_parquet
from ..tables import load


DIM = 64  # embedding dimensionality of the test corpus

# Above this dimensionality the unrolled expression tree risks the
# JVM's 64 KB-per-method codegen ceiling (hit once at r1 with 3
# unrolled dots in one projection); production embedding dims
# (768-1536) route to the Arrow-batched fold below instead.
CODEGEN_DOT_MAX_DIM = 256


def _dot_arrow(a: Column, b: Column) -> Column:
    """Arrow-batched sequential-fold dot for high-dim vectors.

    Vectorized across ROWS with numpy but accumulated dimension-by-
    dimension in float64, so every row's sum order is exactly the
    scalar left fold — the same bit-exactness contract as the
    unrolled codegen path, without its dimensionality ceiling.
    """
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf can't resolve pd.* from this module's scope
    def fold_dot(xs, ys):
        import numpy as np
        import pandas as pd

        if len(xs) == 0:
            return pd.Series([], dtype="float64")
        X = np.stack([np.asarray(v, dtype=np.float64) for v in xs])
        Y = np.stack([np.asarray(v, dtype=np.float64) for v in ys])
        acc = np.zeros(X.shape[0])
        for i in range(X.shape[1]):
            acc += X[:, i] * Y[:, i]
        return pd.Series(acc)

    return pandas_udf(fold_dot, "double")(a, b)


def _dot(a: Column | str, b: Column | str, dim: int = DIM) -> Column:
    """Dot product, dim-adaptive.

    dim <= CODEGEN_DOT_MAX_DIM: unrolled into one whole-stage-codegen
    expression — Spark's higher-order functions (zip_with/aggregate)
    interpret the lambda per element, ~100x slower on pair joins. The
    explicit left-associative sum compiles into codegen AND keeps the
    exact sequential fold order, so it stays bit-identical to
    DuckDB's list_cosine_similarity over DOUBLE[].

    dim > CODEGEN_DOT_MAX_DIM: Arrow-batched numpy fold (same
    sequential accumulation, no codegen overflow at 768/1536 dims).
    """
    if dim > CODEGEN_DOT_MAX_DIM:
        a = F.col(a) if isinstance(a, str) else a
        b = F.col(b) if isinstance(b, str) else b
        return _dot_arrow(a, b)
    if isinstance(a, str) and isinstance(b, str):
        # fast path for named columns: the unrolled sum as ONE
        # generated SQL string parsed JVM-side — building it with
        # Column operators costs ~4 py4j round-trips per term
        # (~0.8 s of driver time per 64-dim dot at r4 profiling,
        # pure plan-construction overhead on every fresh plan).
        # Same left-associative fold, same arithmetic.
        qa, qb = (f"`{c.replace(chr(96), chr(96) * 2)}`" for c in (a, b))
        return F.expr(
            " + ".join(
                f"(CAST({qa}[{i}] AS DOUBLE) * CAST({qb}[{i}] AS DOUBLE))"
                for i in range(dim)
            )
        )
    expr = None
    for i in range(1, dim + 1):
        term = F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        expr = term if expr is None else expr + term
    return expr


def norm(a: Column | str, dim: int = DIM) -> Column:
    return F.sqrt(_dot(a, a, dim))


def _clamp1(c: Column) -> Column:
    """DuckDB's list_cosine_similarity CLAMPS its result to [-1, 1]:
    an identity pair whose rounded quotient lands at 1.0000000000000002
    comes back as exactly 1.0 (caught by the sf1 validation's
    replicated vectors). Mirror the clamp so pair scans stay
    bit-identical at every scale."""
    return F.least(F.lit(1.0), F.greatest(F.lit(-1.0), c))


def cosine(a: Column | str, b: Column | str, dim: int = DIM) -> Column:
    return _clamp1(_dot(a, b, dim) / (norm(a, dim) * norm(b, dim)))


NEARDUP_THRESHOLD = 0.4

# embedding_neardup is the O(N²) exactness baseline: it broadcasts
# the whole corpus to every executor. That is only sane for corpora
# that fit comfortably in executor memory — beyond this bound the
# operator REFUSES and points at the LSH scale path instead of
# OOMing the driver at 100 TB. 1M × 64 dims × 8B ≈ 512 MB broadcast.
NEARDUP_MAX_CORPUS = 1_000_000


def _corpus_matrix(emb: DataFrame):
    """(vec_ids int64[n], matrix float64[n, DIM]) built FROM the
    loaded DataFrame (arrow transfer), so version/filter semantics of
    the source can never diverge from what the pair scan sees."""
    import numpy as np

    t = emb.select("vec_id", "embedding").toArrow()
    ids = t["vec_id"].to_numpy()
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float32).astype(np.float64)
    return ids, mat


def _seq_norms(mat):
    """Row norms accumulated dimension-sequentially (bit-identical
    to the scalar fold DuckDB runs)."""
    import numpy as np

    acc = np.zeros(mat.shape[0])
    for i in range(mat.shape[1]):
        acc += mat[:, i] * mat[:, i]
    return np.sqrt(acc)


def _require_nonzero_norms(nrm) -> None:
    """Refuse zero-norm embeddings LOUDLY (r10 advice). Cosine
    similarity is undefined for the zero vector: the declarative
    forms raise Spark's ANSI DIVIDE_BY_ZERO on the same input,
    while the numpy kernels would silently produce NaN cosines and
    rank them differently than Spark's NaN-greatest desc ordering —
    breaking the documented bit-identity contract between the two
    forms. One shared refusal at every norm computation keeps the
    contract honest: both forms fail, neither emits NaN rankings."""
    import numpy as np

    if (np.asarray(nrm) == 0).any():
        raise ValueError(
            "zero-norm embedding encountered: cosine similarity is "
            "undefined for the zero vector (the declarative form "
            "raises ANSI DIVIDE_BY_ZERO on the same input) — filter "
            "or re-embed zero vectors before the ANN/KNN operators"
        )


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine ≥ threshold, exact.

    Arrow-vectorized pair scan: each executor batch of vectors is
    scored against the broadcast corpus matrix with numpy, but the
    accumulation loops over *dimensions* (vectorized across pairs),
    so every pair's sum order is exactly the scalar sequential fold
    — bit-identical to the DuckDB oracle, ~1000x faster than
    per-pair expression evaluation. Inherently O(N²): this operator
    is the exactness baseline; ann_ivf is the 100 TB path.
    """
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    if n_corpus > NEARDUP_MAX_CORPUS:
        raise ValueError(
            f"embedding_neardup is the exact O(N²) baseline and bounds "
            f"its broadcast corpus at {NEARDUP_MAX_CORPUS} vectors "
            f"(got {n_corpus}); use embedding_neardup_ivf (the "
            "SemDeDup-style bucketed scale path) for larger corpora"
        )
    ids, corpus = _corpus_matrix(emb)
    corpus_norms = _seq_norms(corpus)
    bc = spark.sparkContext.broadcast((ids, corpus, corpus_norms))

    def score(batches):
        # Two-phase exactness (r5): a BLAS matmul prefilters the
        # pair matrix with a 1e-6 relative margin, then ONLY the
        # surviving pairs get the dimension-sequential fold that is
        # bit-identical to DuckDB. Provably lossless: the fold and
        # the blocked BLAS sum differ by at most gamma_64*Σ|x_i·y_i|
        # <= 7.1e-15 * (|x||y|), far inside the margin, so no pair
        # with exact cosine >= threshold can be prefiltered away;
        # sub-threshold pairs admitted by the margin are discarded
        # by the exact recheck. Cuts the hot loop's memory traffic
        # 64x (one dgemm pass vs 64 broadcast passes): sf1 pair
        # scan 54s -> ~8s.
        c_ids, C, c_nrm = bc.value
        # BLOCK the corpus columns: an unblocked batch x corpus
        # score matrix is batch_rows*n_corpus*8 bytes — far past
        # executor memory well under the NEARDUP_MAX_CORPUS guard
        # (r8 review finding; the bucket_verify sibling blocks for
        # the same reason). Pair selection and the exact fold are
        # per-pair, so blocking changes no value.
        blk = max(1, (64 << 20) // max(1, 8 * 4096))  # ~2048 cols
        for pdf in batches:
            X = np.array(list(pdf["embedding"]), dtype=np.float32).astype(np.float64)
            x_ids = pdf["vec_id"].to_numpy()
            if len(X) == 0:
                continue
            x_nrm = _seq_norms(X)
            out_a, out_b, out_c = [], [], []
            for s in range(0, C.shape[0], blk):
                Cb = C[s : s + blk]
                cb_ids = c_ids[s : s + blk]
                cb_nrm = c_nrm[s : s + blk]
                approx = X @ Cb.T
                denom = x_nrm[:, None] * cb_nrm[None, :]
                ai, bi = np.nonzero(
                    (x_ids[:, None] < cb_ids[None, :])
                    & (approx >= (NEARDUP_THRESHOLD - 1e-6) * denom)
                )
                if len(ai) == 0:
                    continue
                A, B = X[ai], Cb[bi]
                acc = np.zeros(len(ai))
                for i in range(C.shape[1]):  # exact sequential fold
                    acc += A[:, i] * B[:, i]
                # DuckDB clamps cosine into [-1, 1] — mirror it
                cos = np.clip(
                    acc / (x_nrm[ai] * cb_nrm[bi]), -1.0, 1.0
                )
                keep = cos >= NEARDUP_THRESHOLD
                out_a.append(x_ids[ai][keep])
                out_b.append(cb_ids[bi][keep])
                out_c.append(cos[keep])
            if not out_a:
                yield pd.DataFrame(
                    {"vec_a": [], "vec_b": [], "cos_sim": []}
                ).astype({"vec_a": "int64", "vec_b": "int64",
                          "cos_sim": "float64"})
                continue
            yield pd.DataFrame(
                {
                    "vec_a": np.concatenate(out_a),
                    "vec_b": np.concatenate(out_b),
                    "cos_sim": np.concatenate(out_c),
                }
            )

    # a small parquet file arrives as ONE input partition, which
    # would serialize the whole O(N·corpus) scan onto one core (925s
    # at sf1); spread the probe side across the cluster first — the
    # corpus side is already broadcast, so this shuffle is tiny
    n_parts = spark.sparkContext.defaultParallelism
    return (
        emb.repartition(n_parts)
        .mapInPandas(score, schema="vec_a long, vec_b long, cos_sim double")
        .orderBy("vec_a", "vec_b")
    )


EMBEDDING_NEARDUP_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                         CAST(b.embedding AS DOUBLE[])) AS cos_sim
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {NEARDUP_THRESHOLD}
ORDER BY vec_a, vec_b
"""

N_PROBES = 10
TOP_K = 10


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    # norms are projected BEFORE the join so the post-join stage
    # compiles ONE unrolled 64-term dot product instead of three
    # (cosine inlines dot + both norms): ~3x less generated code,
    # ~1.3s less plan-compile per fresh run; arithmetic unchanged
    # (dot/(norm_p*norm_n), same sequential fold, same clamp)
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        norm("embedding").alias("p_nrm"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        norm("embedding").alias("n_nrm"),
    )
    scored = corpus.join(
        F.broadcast(probes), F.col("probe_id") != F.col("neighbor_id")
    ).select(
        "probe_id",
        "neighbor_id",
        _clamp1(
            _dot("pe", "ne")
            / (F.col("p_nrm") * F.col("n_nrm"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("probe_id", "neighbor_id", "cos_sim", "rnk")
        .orderBy("probe_id", "rnk")
    )


_ANN_TOPK_INNER = f"""
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                           CAST(c.embedding AS DOUBLE[])) AS cos_sim,
    ROW_NUMBER() OVER (
      PARTITION BY p.vec_id
      ORDER BY list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])) DESC,
               c.vec_id ASC) AS rnk
  FROM embeddings p, embeddings c
  WHERE p.vec_id < {N_PROBES} AND c.vec_id != p.vec_id
"""

ANN_TOPK_SQL = f"""
SELECT probe_id, neighbor_id, cos_sim, CAST(rnk AS INTEGER) AS rnk
FROM ({_ANN_TOPK_INNER})
WHERE rnk <= {TOP_K}
ORDER BY probe_id, rnk
"""


def _topk_flag_sql(flag_col: str) -> str:
    """The brute-force top-k oracle with a literal-TRUE recall flag —
    the oracle side of the r5 hash-greening pattern: the Spark query
    emits the exact top-k plus a computed recall-≥-bound boolean, the
    oracle asserts the same rows plus TRUE, so an index recall
    regression breaks the driver hash."""
    return f"""
SELECT probe_id, neighbor_id, cos_sim, CAST(rnk AS INTEGER) AS rnk,
       TRUE AS {flag_col}
FROM ({_ANN_TOPK_INNER})
WHERE rnk <= {TOP_K}
ORDER BY probe_id, rnk
"""

IVF_K = 16  # centroid count (sqrt-ish of local corpus; 4096+ at scale)
IVF_NPROBE = 4


def _ivf_assignments(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF: centroids are the K lowest-vec_id vectors
    (stand-in for a k-means fit, which would be precomputed and
    broadcast in production). Returns (centroids, assignments).

    Norms are projected BEFORE the fan-out join (the
    ann_topk_bruteforce discipline): an inlined cosine() holds three
    unrolled 64-term dots per projection — past janino's 64 KB
    method limit, forcing the whole assignment stage back to
    interpreted eval (r8 review; arithmetic unchanged:
    dot/(nrm*c_nrm), same fold, same clamp)."""
    from pyspark.sql import Window

    emb_n = emb.select(
        "vec_id", "embedding", norm("embedding").alias("nrm")
    )
    centroids = emb_n.where(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("c_nrm"),
    )
    scored = emb_n.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "embedding",
        "nrm",
        "centroid_id",
        _clamp1(
            _dot("embedding", "ce") / (F.col("nrm") * F.col("c_nrm"))
        ).alias("c_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    assignments = (
        scored.withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") == 1)
        .select("vec_id", "embedding", "nrm", "centroid_id")
    )
    return centroids, assignments


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with deterministic seed centroids (the K lowest-vec_id
    vectors). Because every step — centroid pick, nearest-centroid
    assignment, nprobe bucket choice, in-bucket exact cosine top-k —
    is a deterministic composition of cosine + rank with explicit tie
    breaks, the DuckDB oracle replicates the ALGORITHM itself
    (ANN_IVF_SQL), so this row is hash-exact (r5; previously
    rows-only). The k-means-refined variants (ann_ivf_indexed /
    ann_ivf_pq) can't be SQL-replicated and use the recall-flag
    pattern instead."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    centroids, assignments = _ivf_assignments(emb)
    # probe norms projected once, same rationale as _ivf_assignments
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        norm("embedding").alias("p_nrm"),
    )
    # nearest IVF_NPROBE buckets per probe
    probe_buckets = (
        probes.crossJoin(F.broadcast(centroids))
        .select(
            "probe_id", "pe", "p_nrm", "centroid_id",
            _clamp1(
                _dot("pe", "ce") / (F.col("p_nrm") * F.col("c_nrm"))
            ).alias("c_sim"),
        )
        .withColumn(
            "brnk",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(
                    F.desc("c_sim"), F.asc("centroid_id")
                )
            ),
        )
        .where(F.col("brnk") <= IVF_NPROBE)
        .select("probe_id", "pe", "p_nrm", "centroid_id")
    )
    # search only assigned buckets (equi-join on centroid_id)
    cands = probe_buckets.join(assignments, "centroid_id").where(
        F.col("vec_id") != F.col("probe_id")
    )
    scored = cands.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        _clamp1(
            _dot("pe", "embedding") / (F.col("p_nrm") * F.col("nrm"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("probe_id", "neighbor_id", "cos_sim", "rnk")
        .orderBy("probe_id", "rnk")
    )


ANN_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
c AS (
  SELECT vec_id AS centroid_id, emb AS ce FROM e WHERE vec_id < {IVF_K}
),
assign AS (
  SELECT vec_id, emb, centroid_id FROM (
    SELECT e.vec_id, e.emb, c.centroid_id,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.emb, c.ce) DESC,
                 c.centroid_id ASC) AS crnk
    FROM e CROSS JOIN c) t
  WHERE crnk = 1
),
p AS (
  SELECT vec_id AS probe_id, emb AS pe FROM e WHERE vec_id < {N_PROBES}
),
pb AS (
  SELECT probe_id, pe, centroid_id FROM (
    SELECT p.probe_id, p.pe, c.centroid_id,
      ROW_NUMBER() OVER (PARTITION BY p.probe_id
        ORDER BY list_cosine_similarity(p.pe, c.ce) DESC,
                 c.centroid_id ASC) AS brnk
    FROM p CROSS JOIN c) t
  WHERE brnk <= {IVF_NPROBE}
),
cand AS (
  SELECT pb.probe_id, a.vec_id AS neighbor_id,
    list_cosine_similarity(pb.pe, a.emb) AS cos_sim
  FROM pb JOIN assign a USING (centroid_id)
  WHERE a.vec_id <> pb.probe_id
)
SELECT probe_id, neighbor_id, cos_sim, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT probe_id, neighbor_id, cos_sim,
    ROW_NUMBER() OVER (PARTITION BY probe_id
      ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM cand) t
WHERE rnk <= {TOP_K}
ORDER BY probe_id, rnk
"""


# Recall bounds for the hashed flags (r5). Test assertions
# (test_llm_ops/test_pq) hold the tighter algorithmic bounds (0.9 /
# 0.8); the hashed flags sit one notch below so ordinary sf-to-sf
# variation can't flip a driver row while a real regression still
# does. Measured: indexed 0.93-1.0, PQ 0.82-1.0, LSH 0.65-0.9 across
# sf0.001-1.
IVF_INDEXED_RECALL_BOUND = 0.85
PQ_RECALL_BOUND = 0.7
LSH_RECALL_BOUND = 0.6


def _with_recall_flag(
    exact: DataFrame,
    approx: DataFrame,
    bound: float,
    flag_col: str,
    keys: tuple[str, str] = ("probe_id", "neighbor_id"),
    extra_ok: DataFrame | None = None,
) -> DataFrame:
    """exact rows + one constant boolean column: recall of the
    approximate result against the exact rows is >= bound. The 1-row
    aggregate is broadcast back (the tpch_q15 shape). The exact
    frame feeds BOTH the audit aggregate and the returned rows, so
    it is spilled to a parquet stage — its (expensive) subtree
    executes once and the small result is re-read from durable
    storage per branch (localCheckpoint would pin the blocks in
    executor memory, unrecoverable after executor loss).

    ``extra_ok`` (r14): an optional 1-row single-boolean frame ANDed
    into the flag — e.g. ann_ivf_after_delete's "zero deleted ids
    served" audit rides the same flag column instead of duplicating
    this aggregate shape."""
    exact = spill_to_parquet(exact, "recall_exact")
    hits = exact.select(*keys).join(
        approx.select(*keys).withColumn("hit", F.lit(1)),
        list(keys),
        "left",
    )
    stats = hits.agg(
        (
            F.coalesce(F.sum("hit"), F.lit(0))
            / F.greatest(F.count(F.lit(1)), F.lit(1))
            >= bound
        ).alias(flag_col)
    )
    if extra_ok is not None:
        stats = stats.crossJoin(extra_ok.toDF("__extra_ok")).select(
            (F.col(flag_col) & F.col("__extra_ok")).alias(flag_col)
        )
    return exact.crossJoin(F.broadcast(stats))


# 6 bands x 3 bits: at cos>=0.4 (theta~66deg, per-bit agreement
# ~0.63) expected recall = 1-(1-0.63^3)^6 ~ 0.82; higher similarity
# thresholds recall near 1.0. More bits/band (and more bands) trade
# candidate volume for recall at scale.
LSH_PLANES = 18
LSH_BANDS = 6


def _lsh_projections(dim: int = DIM, planes: int = LSH_PLANES):
    """Deterministic random hyperplanes (seeded), shared by executors."""
    import numpy as np

    rng = np.random.RandomState(42)
    return rng.standard_normal((planes, dim))


def lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection signatures, banded bucketing,
    candidates only from bucket collisions, then exact cosine
    verification. The driver query ``embedding_neardup_lsh`` wraps
    it with a recall audit against the exact pair scan so the row
    hash-checks.

    Scale honesty (r7, measured in the sf10 smoke): with 3-bit
    bands, two RANDOM vectors collide in some band with prob
    1-(1-1/8)^6 ≈ 0.55 — the bucket scan prunes the quadratic pair
    space only ~2×. Low-threshold near-dup (cos barely above the
    random-cosine noise floor) is inherently unclusterable, so this
    operator is the recall-audited SMALL-SCALE tool; the 100 TB
    dedup path is ``ivf_neardup_pairs`` (high-similarity duplicates,
    bucket count scaled to corpus size, linear work)."""
    import numpy as np
    import pandas as pd

    planes = _lsh_projections()
    bc = spark.sparkContext.broadcast(planes)
    emb = load(spark, sf_dir, "embeddings")

    def signatures(batches):
        P = bc.value
        bits_per_band = LSH_PLANES // LSH_BANDS
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf["embedding"]), dtype=np.float32).astype(np.float64)
            signs = (X @ P.T) >= 0  # (n, planes) sign bits
            rows = {"vec_id": [], "band": [], "bucket": []}
            for b in range(LSH_BANDS):
                seg = signs[:, b * bits_per_band : (b + 1) * bits_per_band]
                bucket = np.zeros(len(X), dtype=np.int64)
                for i in range(seg.shape[1]):
                    bucket = bucket * 2 + seg[:, i]
                rows["vec_id"].extend(pdf["vec_id"].tolist())
                rows["band"].extend([b] * len(X))
                rows["bucket"].extend(bucket.tolist())
            yield pd.DataFrame(rows)

    sigs = emb.mapInPandas(signatures, schema="vec_id long, band int, bucket long")

    # Per-BUCKET verification, not per-PAIR: shuffling every bucket
    # collision as a candidate row then equi-joining the vectors back
    # twice materializes O(Σ n_bucket²) rows — 153M at sf1, the whole
    # wall-time. Instead the (band, bucket) groups (one equi-shuffle,
    # the same keys as before) each run a blocked numpy pairwise
    # cosine and emit ONLY the pairs that clear the threshold, so
    # the candidate set lives as vectorized Arrow batches and dies
    # inside the task. Survivor count is O(true near-dups × bands),
    # orders of magnitude smaller. Bucket sizes are bounded by the
    # band width (2^bits buckets/band; tune LSH_PLANES up if a
    # corpus skews a bucket past executor memory) and the matmul is
    # row-blocked so peak memory is O(block × n_bucket).
    def bucket_verify(pdf):
        ids = pdf["vec_id"].to_numpy()
        X = np.array(list(pdf["embedding"]), dtype=np.float32).astype(np.float64)
        nrm = np.sqrt((X * X).sum(axis=1))
        out_a, out_b = [], []
        blk = 1024
        for i0 in range(0, len(X), blk):
            C = X[i0 : i0 + blk] @ X.T
            C /= nrm[i0 : i0 + blk, None]
            C /= nrm[None, :]
            # the proven-lossless 1e-6 margin (the `score` prefilter
            # discipline): a borderline true pair whose BLAS cosine
            # rounds a ulp under the threshold must still reach the
            # exact JVM recheck, which alone decides (r8 review)
            ii, jj = np.nonzero(C >= NEARDUP_THRESHOLD - 1e-6)
            ii += i0
            keep = ids[ii] < ids[jj]
            out_a.append(ids[ii][keep])
            out_b.append(ids[jj][keep])
        return pd.DataFrame(
            {"vec_a": np.concatenate(out_a), "vec_b": np.concatenate(out_b)}
        )

    withvec = sigs.join(emb.select("vec_id", "embedding"), "vec_id")
    cand = (
        withvec.groupBy("band", "bucket")
        .applyInPandas(bucket_verify, schema="vec_a long, vec_b long")
        .distinct()
    )
    # norms are computed per-vector BEFORE the pair join: the
    # post-join projection then holds ONE unrolled 64-term dot
    # product instead of three, keeping the generated code under
    # janino's 64 KB method limit (three inline dots overflow it and
    # force the whole stage back to interpreted eval). Arithmetic is
    # unchanged: dot(a,b) / (norm_a * norm_b), same fold order.
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        norm("embedding").alias("norm_a"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        norm("embedding").alias("norm_b"),
    )
    verified = (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (
                _clamp1(
                    _dot("emb_a", "emb_b")
                    / (F.col("norm_a") * F.col("norm_b"))
                )
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= NEARDUP_THRESHOLD)
    )
    return verified.orderBy("vec_a", "vec_b")


# embedding_neardup_lsh is QUARANTINED as a small-scale diagnostic:
# the r7 sf10 smoke measured its 3-bit sign-RP bands pruning random
# pairs only ~2x (quadratic candidate growth), so it was RETIRED from
# the 100 TB claim (SURVEY C18). It refuses corpora past this bound
# and points at embedding_neardup_ivf, the measured-linear scale
# path, instead of letting a user mistake it for production.
LSH_DIAGNOSTIC_MAX_CORPUS = 100_000


def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMALL-SCALE DIAGNOSTIC ONLY — not a 100 TB path (see
    LSH_DIAGNOSTIC_MAX_CORPUS above; embedding_neardup_ivf is the
    scale route). Driver query (hash-exact as of r5; previously
    rows-only): the exact near-dup pair set (same rows as
    ``embedding_neardup``, DuckDB-replicable) plus one constant
    ``lsh_recall_ok`` boolean — the banded-LSH pair set recalls >=
    LSH_RECALL_BOUND of the exact pairs. The seeded random
    hyperplanes make the LSH set deterministic but not
    SQL-expressible, so the recall AUDIT is the hashed artifact: the
    oracle asserts TRUE, and a recall regression flips the flag and
    fails the driver hash. tests/test_llm_ops.py keeps the tighter
    per-sf recall assertion."""
    n_corpus = load(spark, sf_dir, "embeddings").count()
    if n_corpus > LSH_DIAGNOSTIC_MAX_CORPUS:
        raise ValueError(
            f"embedding_neardup_lsh is a small-scale recall DIAGNOSTIC "
            f"(sign-RP bands measured pruning random pairs only ~2x at "
            f"10x data) and refuses corpora past "
            f"{LSH_DIAGNOSTIC_MAX_CORPUS} vectors (got {n_corpus}); "
            "use embedding_neardup_ivf, the measured-linear scale path"
        )
    exact = embedding_neardup(spark, sf_dir)
    lsh = lsh_neardup_pairs(spark, sf_dir)
    return _with_recall_flag(
        exact, lsh, LSH_RECALL_BOUND, "lsh_recall_ok",
        keys=("vec_a", "vec_b"),
    ).orderBy("vec_a", "vec_b")


EMBEDDING_NEARDUP_LSH_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                         CAST(b.embedding AS DOUBLE[])) AS cos_sim,
  TRUE AS lsh_recall_ok
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {NEARDUP_THRESHOLD}
ORDER BY vec_a, vec_b
"""


def ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-index variant
    of ann_ivf — Lance proper's core feature (a vector index stored
    with the dataset): embeddings are written as a lance dataset,
    ``build_ivf_index`` fits distributed k-means and persists
    bucket-partitioned postings under ``_indexes/ivf/``, and the
    search scans only the probes' nprobe bucket partitions (Spark
    partition pruning on literal bucket ids — asserted on the plan
    in tests). At 100 TB the search IO is nprobe/k of the index,
    independent of corpus size.

    Hash discipline (r5; previously rows-only): k-means-refined
    centroids aren't SQL-replicable, so the hashed output is the
    exact brute-force top-k plus a constant ``ivf_recall_ok`` flag —
    recall of the index search vs exact >= IVF_INDEXED_RECALL_BOUND —
    which the oracle asserts literally TRUE. The index build+search
    still runs in full; tests keep the tighter >=0.9 assertion."""
    import os
    import shutil

    from ..sources.datasource import register
    from ..sources.vector_index import ann_search, build_ivf_index

    register(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join("/tmp/lance_duckdb_spark", tag, "ivfindex.lance")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.dirname(root), exist_ok=True)
    emb = load(spark, sf_dir, "embeddings")
    emb.select("vec_id", "embedding").write.format("lance").mode(
        "overwrite"
    ).save(root)
    build_ivf_index(spark, root, k=IVF_K, lloyd_iters=2)
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    # Lloyd-refined centroids pack clusters tighter than the raw
    # seed centroids ann_ivf uses, so borderline neighbors spread
    # across more buckets: probe 6/16 (measured recall 0.93 vs 0.86
    # at nprobe=4); at production scale (k=4096) nprobe stays a
    # small fraction of k
    approx = ann_search(spark, root, probes, k_neighbors=TOP_K, nprobe=6)
    exact = ann_topk_bruteforce(spark, sf_dir)
    return _with_recall_flag(
        exact, approx, IVF_INDEXED_RECALL_BOUND, "ivf_recall_ok"
    ).orderBy("probe_id", "rnk")


def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lance proper's DEFAULT index
    type, IVF_PQ: coarse IVF buckets plus product-quantized
    residuals, so the persisted postings hold 8 one-byte codes per
    vector instead of 64 floats (the 100 TB memory/IO argument for
    PQ). Search prunes to the probes' buckets, ranks candidates by
    asymmetric distance over the codes alone, then exact-reranks
    the top refine*k via take-by-id on the dataset.

    Hash discipline (r5; previously rows-only): same recall-flag
    pattern as ann_ivf_indexed — the hashed rows are the exact
    brute-force top-k plus a constant ``pq_recall_ok`` boolean
    (recall of the PQ search vs exact >= PQ_RECALL_BOUND), asserted
    TRUE by the oracle; tests/test_pq.py keeps the tighter >=0.8
    assertion."""
    import os
    import shutil

    from ..sources.datasource import register
    from ..sources.vector_index import ann_search_pq, build_ivf_pq_index

    register(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join("/tmp/lance_duckdb_spark", tag, "ivfpq.lance")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.dirname(root), exist_ok=True)
    emb = load(spark, sf_dir, "embeddings")
    emb.select("vec_id", "embedding").write.format("lance").mode(
        "overwrite"
    ).save(root)
    build_ivf_pq_index(spark, root, k=IVF_K, lloyd_iters=2)
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    approx = ann_search_pq(
        spark, root, probes, k_neighbors=TOP_K, nprobe=6, refine=4
    )
    exact = ann_topk_bruteforce(spark, sf_dir)
    return _with_recall_flag(
        exact, approx, PQ_RECALL_BOUND, "pq_recall_ok"
    ).orderBy("probe_id", "rnk")


# Filtered ANN search (r13, r12 VERDICT item 1 — the production
# vector-search call shape; Lance proper's nearest+filter scan,
# rust/scanner.rs with rust/lib.rs:148-236 and lance_scan's pushdown
# in src/lance_scan.cpp). The predicate rides the INDEXED search with
# PRE-filter semantics: the top-k window ranks qualifying rows only —
# a post-filtered unfiltered top-k would under-return (at ~20%
# selectivity, ~8 of 10 results vanish). `label` is the embeddings
# table's metadata column; the filter reaches the dataset scan
# through the datasource pushdown and the candidate set is
# semi-joined on vec_id before ranking (sources/vector_index.py
# _filter_ids).
ANN_FILTER_PRED = "label IN (2, 5)"
# At ~20% selectivity the qualifying neighbors spread across more
# buckets than an unfiltered top-k's (each bucket holds ~5x fewer
# qualifying rows), so the filtered search probes 12/16 buckets (vs
# 6 unfiltered) — the standard filtered-ANN nprobe escalation; at
# production k=4096 the same 2x-over-unfiltered factor stays a small
# fraction of k. Measured recall 0.88-0.99 across sf0.001/0.01/0.1
# (nprobe=8 drew 0.72-0.83 — the escalation is what buys the
# headroom); flag bound one notch below the measured floor (the r5
# discipline: sf jitter can't flip a driver row, a real regression
# still does).
FILTERED_RECALL_BOUND = 0.8
FILTERED_NPROBE = 12


def _ann_topk_filtered_exact(
    spark: SparkSession, sf_dir: str, pred: str = ANN_FILTER_PRED
) -> DataFrame:
    """Exact filtered top-k: brute force over ONLY the qualifying
    corpus rows — the ground truth a pre-filter search must chase
    (and the SQL-replicable hashed sub-result of ann_ivf_filtered;
    with ``pred`` a survivor predicate, of ann_ivf_after_delete).
    Same plan discipline as ann_topk_bruteforce: norms projected
    before the broadcast join, one unrolled codegen dot."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        norm("embedding").alias("p_nrm"),
    )
    corpus = emb.where(pred).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        norm("embedding").alias("n_nrm"),
    )
    scored = corpus.join(
        F.broadcast(probes), F.col("probe_id") != F.col("neighbor_id")
    ).select(
        "probe_id",
        "neighbor_id",
        _clamp1(
            _dot("pe", "ne") / (F.col("p_nrm") * F.col("n_nrm"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("probe_id", "neighbor_id", "cos_sim", "rnk")
    )


def _staged_ivf_dataset(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    delete_pred: str | None = None,
) -> str:
    """Shared staging core for the indexed driver queries: a
    (vec_id, embedding, label) lance dataset + IVF index under
    /tmp/.../<name>, optionally followed by a deletion-vector DELETE
    (``delete_pred`` — the after-delete scenario's version 2). Reuse
    the staged artifact when already present and current (the
    lance_take discipline): content is deterministic per sf (same
    rows, same sort-free write, deterministic k-means init + Lloyd,
    and a DELETE whose mask is a pure function of vec_id), so a
    rebuilt artifact is bit-identical to the reused one — serving
    cost, not output, is what changes. The row count comes from the
    parquet FOOTER, not a count() action. ONE implementation (r14
    review) so the staging/reuse discipline cannot drift between
    ann_ivf_filtered / lance_sql_ann / ann_ivf_after_delete."""
    import json as _json
    import os
    import shutil

    from pyspark.sql.types import StructType

    from ..sources import lance_format as lf
    from ..sources.datasource import register
    from ..sources.vector_index import build_ivf_index, read_index_meta

    register(spark)
    tag = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join("/tmp/lance_duckdb_spark", tag, name)
    emb = load(spark, sf_dir, "embeddings")
    src = emb.select("vec_id", "embedding", "label")
    expected_version = 1 if delete_pred is None else 2
    reuse = False
    try:
        import pyarrow.parquet as _pq

        n_src = _pq.read_metadata(
            os.path.join(sf_dir, "embeddings.parquet")
        ).num_rows
        m = lf.read_manifest(root)
        meta = read_index_meta(root)
        reuse = (
            m.version == expected_version
            and sum(f.num_rows for f in m.fragments) == n_src
            and (
                delete_pred is None
                or sum(f.num_deleted for f in m.fragments) > 0
            )
            and StructType.fromJson(_json.loads(m.schema_json))
            == src.schema
            and meta["dataset_version"] == 1
            and meta["k"] == IVF_K
            and meta["column"] == "embedding"
        )
    except Exception:
        reuse = False
    if not reuse:
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(os.path.dirname(root), exist_ok=True)
        src.write.format("lance").mode("overwrite").save(root)
        build_ivf_index(spark, root, k=IVF_K, lloyd_iters=2)
        if delete_pred is not None:
            from ..catalog import lance_sql

            lance_sql(
                spark, f"DELETE FROM '{root}' WHERE {delete_pred}"
            ).collect()
    return root


def _staged_filtered_root(spark: SparkSession, sf_dir: str) -> str:
    """The staged dataset+index shared by ann_ivf_filtered AND
    lance_sql_ann (see _staged_ivf_dataset)."""
    return _staged_ivf_dataset(spark, sf_dir, "ivffiltered.lance")


def ann_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query (r13): predicate + vector in ONE indexed search.
    The embeddings table (vec_id, embedding, label) is written as a
    lance dataset, IVF-indexed, and searched with
    ``filter=ANN_FILTER_PRED`` — pre-filter semantics, buckets still
    partition-pruned, staleness-guarded like every indexed search.

    Hash discipline (the ann_ivf_indexed recall-flag pattern):
    k-means-refined centroids aren't SQL-replicable, so the hashed
    rows are the EXACT filtered brute-force top-k plus a constant
    ``filtered_recall_ok`` boolean — recall of the filtered index
    search vs filtered-exact >= FILTERED_RECALL_BOUND — which the
    oracle asserts literally TRUE. Every result of the index search
    satisfying the predicate is additionally asserted in
    tests/test_filtered_ann.py (with delta-extend and staleness
    coverage)."""
    from ..sources.vector_index import ann_search

    root = _staged_filtered_root(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    approx = ann_search(
        spark,
        root,
        probes,
        k_neighbors=TOP_K,
        nprobe=FILTERED_NPROBE,
        filter=ANN_FILTER_PRED,
    )
    exact = _ann_topk_filtered_exact(spark, sf_dir)
    return _with_recall_flag(
        exact, approx, FILTERED_RECALL_BOUND, "filtered_recall_ok"
    ).orderBy("probe_id", "rnk")


# The curation loop's delete step: ~10% of the corpus (every vec_id
# ≡ 3 mod 10 — uniform across buckets, so no nprobe escalation is
# needed beyond the unfiltered setting's headroom) is deletion-
# vector-DELETEd AFTER the index build. The search must then serve
# WITHOUT a rebuild and WITHOUT resurrecting deleted neighbors —
# vector_index._staleness_gate's deletion-aware live mask.
AFTER_DELETE_PRED = "vec_id % 10 = 3"
AFTER_DELETE_SURVIVOR_PRED = "vec_id % 10 <> 3"
AFTER_DELETE_NPROBE = 8
# measured post-delete recall vs survivor-exact: 0.94 / 0.94 / 1.00
# at sf0.001 / 0.01 / 0.1 (nprobe=8 of 16 buckets; deletion is
# non-selective so no escalation needed); bound one notch below the
# measured floor (r5 discipline: sf jitter can't flip a driver row,
# a real regression still does)
AFTER_DELETE_RECALL_BOUND = 0.8


def ann_ivf_after_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query (r14, r13 VERDICT item 2 — deletion-aware index
    serving): write embeddings as a lance dataset, build the IVF
    index, deletion-vector-DELETE ~10% of rows (version 2), then
    ``ann_search`` at the HEAD. Before r14 this refused (full
    rebuild demanded); now the search anti-joins candidates against
    the live deletion masks (Lance proper's scan-time masking,
    rust/scanner.rs) and serves the exact top-k over SURVIVORS —
    O(deleted rows) extra work, index untouched.

    Hash discipline (the ann_ivf_filtered recall-flag pattern):
    hashed rows are the exact survivor-only brute-force top-k plus a
    constant ``after_delete_ok`` boolean — TRUE iff (a) recall of
    the post-delete index search vs survivor-exact >= bound AND (b)
    the index search served ZERO deleted ids. The oracle asserts it
    literally TRUE; tests/test_deletion_aware.py covers the serving
    ladder (delete-only serves, append/rewrite still refuse,
    allow_stale still means the snapshot)."""
    from ..sources.vector_index import ann_search

    root = _staged_ivf_dataset(
        spark, sf_dir, "ivfafterdel.lance", delete_pred=AFTER_DELETE_PRED
    )
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    approx = ann_search(
        spark,
        root,
        probes,
        k_neighbors=TOP_K,
        nprobe=AFTER_DELETE_NPROBE,
    )
    exact = _ann_topk_filtered_exact(
        spark, sf_dir, pred=AFTER_DELETE_SURVIVOR_PRED
    )
    # the served ids feed TWO consumers — the zero-deleted-ids audit
    # below and _with_recall_flag's hit join — and as two distinct
    # plan subtrees each re-ran the whole serve path (bucket-pruned
    # posting scan, probe join, scored top-k window, live-mask
    # anti-join). Spill the narrow (probe_id, neighbor_id) projection
    # once (r14 optimization, the _with_recall_flag discipline): the
    # serve subtree executes once, both consumers read the tiny
    # parquet. Longs roundtrip bit-exactly; neither consumer reads
    # any other column.
    approx = spill_to_parquet(
        approx.select("probe_id", "neighbor_id"), "afterdel-approx"
    )
    # (b) is the deletion-aware contract itself: a single deleted id
    # in the served top-k means the live mask failed. Derived from
    # AFTER_DELETE_PRED (vec_id -> neighbor_id) so the audit can
    # never drift from the staged DELETE's predicate (r14 review).
    neighbor_deleted = AFTER_DELETE_PRED.replace("vec_id", "neighbor_id")
    none_deleted = approx.agg(
        (
            F.coalesce(
                F.sum(F.when(F.expr(neighbor_deleted), 1)), F.lit(0)
            )
            == 0
        ).alias("d_ok")
    )
    return _with_recall_flag(
        exact,
        approx,
        AFTER_DELETE_RECALL_BOUND,
        "after_delete_ok",
        extra_ok=none_deleted,
    ).orderBy("probe_id", "rnk")


ANN_AFTER_DELETE_SQL = f"""
SELECT probe_id, neighbor_id, cos_sim, CAST(rnk AS INTEGER) AS rnk,
       TRUE AS after_delete_ok
FROM (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                           CAST(c.embedding AS DOUBLE[])) AS cos_sim,
    ROW_NUMBER() OVER (
      PARTITION BY p.vec_id
      ORDER BY list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])) DESC,
               c.vec_id ASC) AS rnk
  FROM embeddings p, embeddings c
  WHERE p.vec_id < {N_PROBES} AND c.vec_id != p.vec_id
    AND c.vec_id % 10 != 3
)
WHERE rnk <= {TOP_K}
ORDER BY probe_id, rnk
"""


ANN_FILTERED_SQL = f"""
SELECT probe_id, neighbor_id, cos_sim, CAST(rnk AS INTEGER) AS rnk,
       TRUE AS filtered_recall_ok
FROM (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                           CAST(c.embedding AS DOUBLE[])) AS cos_sim,
    ROW_NUMBER() OVER (
      PARTITION BY p.vec_id
      ORDER BY list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])) DESC,
               c.vec_id ASC) AS rnk
  FROM embeddings p, embeddings c
  WHERE p.vec_id < {N_PROBES} AND c.vec_id != p.vec_id
    AND c.label IN (2, 5)
)
WHERE rnk <= {TOP_K}
ORDER BY probe_id, rnk
"""


# -- ANN through SQL (the DuckDB-UX spelling) -------------------------------

# One SQL statement serves ONE query vector (the reference's users
# rank against a literal or parameter vector); the driver query
# issues a few statements to exercise the path meaningfully without
# turning the bench entry into a loop benchmark.
SQL_ANN_PROBES = 3


def lance_sql_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query (r14, r13 VERDICT item 3): the SQL spelling of
    filtered ANN — ``SELECT vec_id, cosine_similarity(embedding,
    [<literal vector>]) AS score FROM '<root>' WHERE label IN (2,5)
    AND vec_id <> <pid> ORDER BY score DESC LIMIT k`` — recognized
    by ``lance_sql`` (catalog._run_ann) and served from the
    persisted IVF index: bucket-pruned postings scan, pre-filter
    semi-join, deletion-aware gate — never a brute-force scan. The
    reference's users type SQL against DuckDB's
    ``list_cosine_similarity``; this is that UX on Spark.

    Reuses ann_ivf_filtered's staged dataset + index (identical
    staging discipline). Hash discipline (recall-flag pattern):
    hashed rows are the exact filtered brute-force top-k for the
    SQL_ANN_PROBES query vectors plus a constant ``sql_ann_ok``
    recall flag the oracle asserts literally TRUE. Shape/metric
    refusals and bucket pruning are pytest-asserted
    (tests/test_sql_ann.py)."""
    from ..catalog import lance_sql

    root = _staged_filtered_root(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    probe_rows = (
        emb.where(F.col("vec_id") < SQL_ANN_PROBES)
        .select("vec_id", "embedding")
        .collect()
    )
    parts = []
    for r in probe_rows:
        pid = int(r["vec_id"])
        lit = ", ".join(repr(float(x)) for x in r["embedding"])
        stmt = (
            f"SELECT vec_id, cosine_similarity(embedding, [{lit}]) "
            f"AS score FROM '{root}' "
            f"WHERE label IN (2, 5) AND vec_id <> {pid} "
            f"ORDER BY score DESC LIMIT {TOP_K}"
        )
        parts.append(
            lance_sql(spark, stmt).select(
                F.lit(pid).alias("probe_id"),
                F.col("vec_id").alias("neighbor_id"),
            )
        )
    approx = parts[0]
    for p in parts[1:]:
        approx = approx.unionByName(p)
    exact = _ann_topk_filtered_exact(spark, sf_dir).where(
        F.col("probe_id") < SQL_ANN_PROBES
    )
    return _with_recall_flag(
        exact, approx, FILTERED_RECALL_BOUND, "sql_ann_ok"
    ).orderBy("probe_id", "rnk")


LANCE_SQL_ANN_SQL = f"""
SELECT probe_id, neighbor_id, cos_sim, CAST(rnk AS INTEGER) AS rnk,
       TRUE AS sql_ann_ok
FROM (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                           CAST(c.embedding AS DOUBLE[])) AS cos_sim,
    ROW_NUMBER() OVER (
      PARTITION BY p.vec_id
      ORDER BY list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])) DESC,
               c.vec_id ASC) AS rnk
  FROM embeddings p, embeddings c
  WHERE p.vec_id < {SQL_ANN_PROBES} AND c.vec_id != p.vec_id
    AND c.label IN (2, 5)
)
WHERE rnk <= {TOP_K}
ORDER BY probe_id, rnk
"""


# -- IVF-bucketed near-dup (the 100 TB dedup path) --------------------------

# each vector joins its NDUP_ASSIGN nearest centroid buckets: a pair
# is found iff the two bucket sets intersect. Multi-assignment is
# the boundary remedy — a near-identical pair (the dedup target,
# cos >= ~0.8) almost always shares its nearest centroid; pairs
# split across a Voronoi boundary are caught via the second
# assignment. SemDeDup-style cluster-then-compare.
NDUP_ASSIGN = 2


# Two-level (coarse-quantizer) IVF (r9 VERDICT item 1): past this
# fine-centroid count, flat assignment is refused its own scale
# hazards — the k ~ n/500 rule makes the n*k assignment O(n^2/500)
# by algebra, and the driver-side k-vector collect/broadcast grows
# with the corpus. Above the bound the operators auto-route through
# two_level_assign (driver holds only ~sqrt(k) coarse seeds).
TWO_LEVEL_MIN_K = 4096
TWO_LEVEL_PROBES = 4
CELL_SALT = 8  # cogroup sub-groups per cell (hot-cell straggler cap)
# Bounded-broadcast tier: while the FINE table fits this many bytes
# (k x dim x 8), the two-level assignment broadcasts it grouped by
# cell and runs as ONE zero-shuffle map pass — same candidates, same
# ranking, bit-identical output to the cogroup form (test-asserted).
# Past the bound (k > ~131k at dim 64) the cogroup form engages: its
# shuffle replicates each vector `probes` times, but nothing grows
# on the driver. 64 MB is deliberately far below broadcast limits —
# the point is a FIXED ceiling, not a tuned one.
TWO_LEVEL_BROADCAST_BYTES = 64 * 1024 * 1024


def two_level_assign(
    spark: SparkSession,
    emb: DataFrame,
    k: int,
    keep_n: int,
    coarse_m: int,
    probes: int,
) -> DataFrame:
    """Two-level IVF assignment: route every vector to its top
    ``keep_n`` of ``k`` fine centroids WITHOUT ever materializing
    the k centroids on the driver.

    Structure (all deterministic, oracle-replicable):

    - fine centroids = the ``k`` lowest-vec_id vectors (the ann_ivf
      seed convention, standing in for a k-means fit);
    - coarse seeds = the ``coarse_m`` lowest-vec_id vectors (a
      prefix of the fine set) — the ONLY driver collect/broadcast,
      ~sqrt(k) rows;
    - each fine centroid lives in its nearest coarse cell (cos DESC,
      cell_id ASC — rank 1), computed distributedly;
    - each vector probes its top ``probes`` coarse cells, then ranks
      only the fine centroids living in those cells; per-cell local
      top-``keep_n`` candidates merge through one slim global window
      (cos DESC, centroid_id ASC).

    Scale shape: per-vector work is coarse_m + probes * k/coarse_m
    dots (vs k flat — O(sqrt(k)) at coarse_m ~ sqrt(k)); the driver
    holds coarse_m vectors (vs k); the cogroup shuffles each vector
    ``probes`` times. Every cosine keeps the DIMENSION-SEQUENTIAL
    fold, so the two-level selection is bit-replicable by the DuckDB
    oracle (embedding_neardup_ivf pins it hash-exact).

    Returns (vec_id, centroid_id, crnk) with crnk in 1..keep_n;
    vectors whose probed cells hold fewer than keep_n fine centroids
    get fewer ranks (same clamp as the flat path)."""
    import numpy as np
    import pandas as pd

    coarse_m = max(1, min(coarse_m, k))
    coarse_rows = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(coarse_m)
        .collect()
    )
    S = np.array(
        [r["embedding"] for r in coarse_rows], dtype=np.float32
    ).astype(np.float64)
    s_ids = np.array([r["vec_id"] for r in coarse_rows], dtype=np.int64)
    s_nrm = _seq_norms(S)
    bc = spark.sparkContext.broadcast((s_ids, S, s_nrm))

    def nearest_cells(n_cells: int):
        def fn(batches):
            ids_s, Sm, nrm_s = bc.value
            keep = min(n_cells, len(Sm))
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(
                    list(pdf["embedding"]), dtype=np.float32
                ).astype(np.float64)
                nx = _seq_norms(X)
                _require_nonzero_norms(nx)
                acc = np.zeros((len(X), len(Sm)))
                for d in range(Sm.shape[1]):
                    acc += X[:, d, None] * Sm[None, :, d]
                cos = np.clip(
                    acc / (nx[:, None] * nrm_s[None, :]), -1.0, 1.0
                )
                order = np.lexsort(
                    (np.broadcast_to(ids_s, cos.shape), -cos), axis=1
                )[:, :keep]
                out = pdf.loc[pdf.index.repeat(keep)].reset_index(
                    drop=True
                )
                out["cell_id"] = ids_s[order].reshape(-1)
                yield out[["vec_id", "embedding", "cell_id"]]

        return fn

    cell_schema = "vec_id long, embedding array<float>, cell_id long"
    fine = emb.select("vec_id", "embedding").orderBy("vec_id").limit(k)
    cells = fine.mapInPandas(nearest_cells(1), schema=cell_schema)
    # a single large parquet file arrives in O(size/maxPartitionBytes)
    # splits — far fewer than the cores at sfd100+ — and the probe
    # pass is the corpus's numpy-heavy stage, so spread it explicitly
    # (round-robin, no key: per-row outputs are batch-independent)
    par = max(emb.sparkSession.sparkContext.defaultParallelism, 8)
    dim = len(coarse_rows[0]["embedding"]) if coarse_rows else 0
    if k * dim * 8 <= TWO_LEVEL_BROADCAST_BYTES:
        # bounded-broadcast tier: the whole fine table (grouped by
        # cell) rides one broadcast and the assignment is a single
        # ZERO-SHUFFLE map pass — no probes-fold replication of the
        # corpus through a cogroup shuffle (the sfd1000 cogroup run
        # measured ~46 GB of shuffle + spill for 21M vectors). The
        # candidates, cosine folds, and tie-breaks are identical, so
        # the output is bit-identical to the cogroup form
        # (test-asserted in tests/test_llm_ops.py).
        fine_rows = cells.collect()  # <= TWO_LEVEL_BROADCAST_BYTES
        grouped: dict[int, list] = {}
        for r in fine_rows:
            grouped.setdefault(int(r["cell_id"]), []).append(
                (int(r["vec_id"]), r["embedding"])
            )
        packed = {}
        for c, rows_ in grouped.items():
            f_ids = np.array([t[0] for t in rows_], dtype=np.int64)
            FM = np.array(
                [t[1] for t in rows_], dtype=np.float32
            ).astype(np.float64)
            packed[c] = (f_ids, FM, _seq_norms(FM))
        bc_fine = spark.sparkContext.broadcast(packed)

        def assign_bcast(batches):
            ids_s, Sm, nrm_s = bc.value
            fine_map = bc_fine.value
            pkeep = min(probes, len(Sm))
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(
                    list(pdf["embedding"]), dtype=np.float32
                ).astype(np.float64)
                nx = _seq_norms(X)
                _require_nonzero_norms(nx)
                vid = pdf["vec_id"].to_numpy()
                acc = np.zeros((len(X), len(Sm)))
                for d in range(Sm.shape[1]):
                    acc += X[:, d, None] * Sm[None, :, d]
                cos_s = np.clip(
                    acc / (nx[:, None] * nrm_s[None, :]), -1.0, 1.0
                )
                probe_cells = ids_s[
                    np.lexsort(
                        (np.broadcast_to(ids_s, cos_s.shape), -cos_s),
                        axis=1,
                    )[:, :pkeep]
                ]
                n = len(X)
                CC: list[list] = [[] for _ in range(n)]
                CI: list[list] = [[] for _ in range(n)]
                for p in range(pkeep):
                    col = probe_cells[:, p]
                    for c in np.unique(col):
                        ent = fine_map.get(int(c))
                        if ent is None:
                            continue
                        m = col == c
                        f_ids, FM, f_nrm = ent
                        Xs, nxs = X[m], nx[m]
                        accf = np.zeros((len(Xs), len(FM)))
                        for d in range(FM.shape[1]):
                            accf += Xs[:, d, None] * FM[None, :, d]
                        cosf = np.clip(
                            accf / (nxs[:, None] * f_nrm[None, :]),
                            -1.0,
                            1.0,
                        )
                        kk = min(keep_n, len(FM))
                        o = np.lexsort(
                            (np.broadcast_to(f_ids, cosf.shape), -cosf),
                            axis=1,
                        )[:, :kk]
                        rr = np.arange(len(Xs))[:, None]
                        sel_cos = cosf[rr, o]
                        sel_ids = f_ids[o]
                        for ii, gr in enumerate(np.nonzero(m)[0]):
                            CC[gr].append(sel_cos[ii])
                            CI[gr].append(sel_ids[ii])
                vv, cc_, rk_ = [], [], []
                for i in range(n):
                    if not CC[i]:
                        continue
                    cosv = np.concatenate(CC[i])
                    idv = np.concatenate(CI[i])
                    o = np.lexsort((idv, -cosv))[:keep_n]
                    for rank, j in enumerate(o, 1):
                        vv.append(vid[i])
                        cc_.append(idv[j])
                        rk_.append(rank)
                yield pd.DataFrame(
                    {
                        "vec_id": np.array(vv, dtype=np.int64),
                        "centroid_id": np.array(cc_, dtype=np.int64),
                        "crnk": np.array(rk_, dtype=np.int32),
                    }
                )

        return (
            emb.select("vec_id", "embedding")
            .repartition(par)
            .mapInPandas(
                assign_bcast,
                schema="vec_id long, centroid_id long, crnk int",
            )
        )
    probed = (
        emb.select("vec_id", "embedding")
        .repartition(par)
        .mapInPandas(nearest_cells(probes), schema=cell_schema)
    )
    # SALT the cogroup: cell populations are uneven (random seed
    # cells draw 2-10x the mean), and applyInPandas materializes a
    # whole group in one task — the sfd1000 smoke measured one hot
    # cell owning a multi-minute straggler. Probers split across
    # CELL_SALT sub-groups (per-row results don't depend on group
    # composition, so output is unchanged); the small fine side
    # replicates per salt.
    probed = probed.withColumn(
        "salt", F.pmod(F.col("vec_id"), F.lit(CELL_SALT)).cast("int")
    )

    def cell_topk(left: "pd.DataFrame", right: "pd.DataFrame"):
        # left = vectors probing this cell, right = the cell's fine
        # centroids; emit each vector's local top-keep_n candidates
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {"vec_id": [], "centroid_id": [], "cos_sim": []}
            ).astype(
                {"vec_id": "int64", "centroid_id": "int64",
                 "cos_sim": "float64"}
            )
        X = np.array(list(left["embedding"]), dtype=np.float32).astype(
            np.float64
        )
        C = np.array(list(right["embedding"]), dtype=np.float32).astype(
            np.float64
        )
        c_ids = right["centroid_id"].to_numpy()
        nx, nc = _seq_norms(X), _seq_norms(C)
        acc = np.zeros((len(X), len(C)))
        for d in range(C.shape[1]):
            acc += X[:, d, None] * C[None, :, d]
        cos = np.clip(acc / (nx[:, None] * nc[None, :]), -1.0, 1.0)
        keep = min(keep_n, len(C))
        order = np.lexsort(
            (np.broadcast_to(c_ids, cos.shape), -cos), axis=1
        )[:, :keep]
        rows = np.arange(len(X))[:, None]
        return pd.DataFrame(
            {
                "vec_id": np.repeat(left["vec_id"].to_numpy(), keep),
                "centroid_id": c_ids[order].reshape(-1),
                "cos_sim": cos[rows, order].reshape(-1),
            }
        )

    salted_cells = (
        cells.select(
            F.col("vec_id").alias("centroid_id"), "embedding", "cell_id"
        )
        .withColumn(
            "salt",
            F.explode(F.array(*[F.lit(i) for i in range(CELL_SALT)])),
        )
    )
    cand = (
        probed.groupBy("cell_id", "salt")
        .cogroup(salted_cells.groupBy("cell_id", "salt"))
        .applyInPandas(
            cell_topk, schema="vec_id long, centroid_id long, cos_sim double"
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("centroid_id")
    )
    return (
        cand.withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") <= keep_n)
        .select("vec_id", "centroid_id", "crnk")
    )


def ivf_neardup_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = NEARDUP_THRESHOLD,
    k: int = IVF_K,
    coarse_m: int | None = None,
    probes: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via IVF bucketing — the 100 TB shape for
    EMBEDDING dedup (cf. the SemDeDup recipe: k-means cluster, then
    compare only within clusters): assign every vector to its
    ``NDUP_ASSIGN`` nearest of ``k`` deterministic seed centroids
    (the k lowest-vec_id vectors — the ann_ivf convention), run the
    exact pair scan WITHIN each bucket only, and union. With k
    scaled to corpus size (k ≈ n/500), per-bucket work is bounded
    and total work is O(n · bucket) — linear — versus the
    sign-RP-LSH variant whose 3-bit bands prune random pairs only
    ~2x (measured: quadratic candidate growth in the r7 sf10 smoke;
    lsh_neardup_pairs remains the recall-audited small-scale tool,
    this is the scale path).

    Deterministic end to end (seed centroids, fold-ordered cosine,
    explicit tie-breaks), so the DuckDB oracle replicates the
    ALGORITHM itself and the driver row is hash-exact — including
    which boundary pairs the bucketing misses. Honest scope: IVF
    near-dup targets genuinely-similar duplicates; pairs barely
    above the random-cosine noise floor (cos ~3σ, e.g. 0.4 at
    dim 64) are not clusterable by ANY bucketing scheme without
    quadratic work, and recall for those is audited in
    tests/test_llm_ops.py, not promised.

    Assignment is Arrow-batched numpy with DIMENSION-SEQUENTIAL
    accumulation (the embedding_neardup fold trick): every
    vector-centroid cosine is bit-identical to the scalar fold
    DuckDB evaluates, so the rank-2 cut can never disagree with the
    oracle's ROW_NUMBER. The in-bucket scan prefilters with one
    dgemm at a proven-lossless 1e-6 margin, then the survivors are
    exact-rechecked JVM-side with the same fold-ordered expression
    the oracle uses."""
    import math

    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    if coarse_m is None and k >= TWO_LEVEL_MIN_K:
        # auto-route through the coarse quantizer: flat assignment at
        # the k ~ n/500 rule is O(n^2/500) and collects k vectors to
        # the driver — the named flat-IVF scale ceiling
        coarse_m = max(1, math.isqrt(k))
    if coarse_m:
        assigned = two_level_assign(
            spark,
            emb.select("vec_id", "embedding"),
            k,
            NDUP_ASSIGN,
            coarse_m,
            probes or TWO_LEVEL_PROBES,
        ).select("vec_id", "centroid_id")
        return _neardup_from_assigned(spark, emb, assigned, threshold)
    cent_rows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
    )
    C = np.array([r["embedding"] for r in cent_rows], dtype=np.float32).astype(
        np.float64
    )
    c_ids = np.array([r["vec_id"] for r in cent_rows], dtype=np.int64)
    c_nrm = _seq_norms(C)
    bc = spark.sparkContext.broadcast((c_ids, C, c_nrm))

    def assign(batches):
        ids_c, Cm, nrm_c = bc.value
        # clamp for tiny corpora / small k (r8 review: a fixed slice
        # crashed with mismatched column lengths when k < NDUP_ASSIGN)
        keep_n = min(NDUP_ASSIGN, len(Cm))
        # BLOCK the centroids: at the operator's own k ~ n/500 recipe
        # a dense batch x k accumulator is (rows*k*8) bytes — 160 GB
        # per task at n=1e9 (r8 review). Per-block top-keep_n
        # candidates then one merge select the same global top set:
        # every per-pair cosine is still the full-dimension
        # sequential fold (bit-identical), and any global top-keep_n
        # member is its block's top-keep_n, so the candidate union
        # provably contains the answer; the final lexsort applies
        # the same (cos DESC, id ASC) tie-break.
        cblk = 4096
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf["embedding"]), dtype=np.float32).astype(
                np.float64
            )
            nx = _seq_norms(X)
            _require_nonzero_norms(nx)
            rows = np.arange(len(X))[:, None]
            cand_cos, cand_ids = [], []
            for s in range(0, len(Cm), cblk):
                Cb = Cm[s : s + cblk]
                ib = ids_c[s : s + cblk]
                nb = nrm_c[s : s + cblk]
                # dimension-sequential dot: acc order per (x, c)
                # pair is the scalar fold — bit-identical to the
                # oracle regardless of blocking
                acc = np.zeros((len(X), len(Cb)))
                for d in range(Cb.shape[1]):
                    acc += X[:, d, None] * Cb[None, :, d]
                cos = np.clip(
                    acc / (nx[:, None] * nb[None, :]), -1.0, 1.0
                )
                order = np.lexsort(
                    (np.broadcast_to(ib, cos.shape), -cos), axis=1
                )
                t = order[:, : min(keep_n, len(Cb))]
                cand_cos.append(cos[rows, t])
                cand_ids.append(ib[t])
            CC = np.concatenate(cand_cos, axis=1)
            CI = np.concatenate(cand_ids, axis=1)
            merged = np.lexsort((CI, -CC), axis=1)[:, :keep_n]
            top_ids = CI[rows, merged]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy(), keep_n
                    ),
                    "centroid_id": top_ids.reshape(-1),
                }
            )

    assigned = emb.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, centroid_id long"
    )
    return _neardup_from_assigned(spark, emb, assigned, threshold)


def _neardup_from_assigned(
    spark: SparkSession,
    emb: DataFrame,
    assigned: DataFrame,
    threshold: float,
) -> DataFrame:
    """Shared ivf_neardup_pairs tail: exact in-bucket pair scan over
    (vec_id, centroid_id) assignments (flat or two-level), followed
    by the JVM-side fold-ordered exact recheck the oracle mirrors."""
    import numpy as np
    import pandas as pd

    def bucket_pairs(pdf):
        ids = pdf["vec_id"].to_numpy()
        X = np.array(list(pdf["embedding"]), dtype=np.float32).astype(
            np.float64
        )
        nrm = _seq_norms(X)
        out_a, out_b = [], []
        blk = 1024
        for i0 in range(0, len(X), blk):
            Cm = X[i0 : i0 + blk] @ X.T
            Cm /= nrm[i0 : i0 + blk, None]
            Cm /= nrm[None, :]
            ii, jj = np.nonzero(Cm >= threshold - 1e-6)  # margin prefilter
            ii += i0
            keep = ids[ii] < ids[jj]
            out_a.append(ids[ii][keep])
            out_b.append(ids[jj][keep])
        return pd.DataFrame(
            {"vec_a": np.concatenate(out_a), "vec_b": np.concatenate(out_b)}
        )

    cand = (
        assigned.join(emb.select("vec_id", "embedding"), "vec_id")
        .groupBy("centroid_id")
        .applyInPandas(bucket_pairs, schema="vec_a long, vec_b long")
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        norm("embedding").alias("norm_a"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        norm("embedding").alias("norm_b"),
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            _clamp1(
                _dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b"))
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def embedding_neardup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the IVF-bucketed near-dup pair set through the
    TWO-LEVEL (coarse-quantizer) assignment — r9 VERDICT item 1's
    scale path, driver-proven hash-exact: 4 coarse cells over the 16
    fine seed centroids, 2 probed cells per vector, rank-2 fine
    assignment within the probed cells. The oracle replicates the
    whole deterministic two-level selection (cell routing, probe
    set, per-vector fine rank with explicit tie-breaks, in-bucket
    exact pairs), misses and all."""
    return ivf_neardup_pairs(spark, sf_dir, coarse_m=4, probes=2)


EMBEDDING_NEARDUP_IVF_SQL = f"""
WITH c AS (
  SELECT vec_id AS centroid_id, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {IVF_K}
),
coarse AS (
  SELECT vec_id AS cell_id, embedding AS se
  FROM embeddings ORDER BY vec_id LIMIT 4
),
cells AS (
  SELECT centroid_id, ce, cell_id FROM (
    SELECT c.centroid_id, c.ce, s.cell_id,
      ROW_NUMBER() OVER (
        PARTITION BY c.centroid_id
        ORDER BY list_cosine_similarity(CAST(c.ce AS DOUBLE[]),
                                        CAST(s.se AS DOUBLE[])) DESC,
                 s.cell_id ASC) AS rnk
    FROM c, coarse s
  ) WHERE rnk = 1
),
probed AS (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, s.cell_id,
      ROW_NUMBER() OVER (
        PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(s.se AS DOUBLE[])) DESC,
                 s.cell_id ASC) AS prnk
    FROM embeddings e, coarse s
  ) WHERE prnk <= 2
),
assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, f.centroid_id,
      ROW_NUMBER() OVER (
        PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(f.ce AS DOUBLE[])) DESC,
                 f.centroid_id ASC) AS crnk
    FROM embeddings e
    JOIN probed p ON p.vec_id = e.vec_id
    JOIN cells f ON f.cell_id = p.cell_id
  ) WHERE crnk <= {NDUP_ASSIGN}
),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM assigned x JOIN assigned y
    ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
)
SELECT p.vec_a, p.vec_b,
  list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                         CAST(eb.embedding AS DOUBLE[])) AS cos_sim
FROM cand p
JOIN embeddings ea ON ea.vec_id = p.vec_a
JOIN embeddings eb ON eb.vec_id = p.vec_b
WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                             CAST(eb.embedding AS DOUBLE[])) >= {NEARDUP_THRESHOLD}
ORDER BY vec_a, vec_b
"""


QUERIES = {
    "embedding_neardup": embedding_neardup,
    "embedding_neardup_lsh": embedding_neardup_lsh,
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_ivf": ann_ivf,
    "ann_ivf_indexed": ann_ivf_indexed,
    "ann_ivf_pq": ann_ivf_pq,
    "ann_ivf_filtered": ann_ivf_filtered,
    "ann_ivf_after_delete": ann_ivf_after_delete,
    "lance_sql_ann": lance_sql_ann,
    "embedding_neardup_ivf": embedding_neardup_ivf,
}

ORACLE = {
    "embedding_neardup_ivf": EMBEDDING_NEARDUP_IVF_SQL,
    "embedding_neardup": EMBEDDING_NEARDUP_SQL,
    "embedding_neardup_lsh": EMBEDDING_NEARDUP_LSH_SQL,
    "ann_topk_bruteforce": ANN_TOPK_SQL,
    "ann_ivf": ANN_IVF_SQL,
    "ann_ivf_indexed": _topk_flag_sql("ivf_recall_ok"),
    "ann_ivf_pq": _topk_flag_sql("pq_recall_ok"),
    "ann_ivf_filtered": ANN_FILTERED_SQL,
    "ann_ivf_after_delete": ANN_AFTER_DELETE_SQL,
    "lance_sql_ann": LANCE_SQL_ANN_SQL,
}
