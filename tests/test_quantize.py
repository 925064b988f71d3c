"""SQ8 compressed-domain search (operators/quantize.py): the error
bound really bounds, the output really equals brute force, and the
plan really never shuffles vectors. Oracle equality is covered by
test_correctness.py."""

from __future__ import annotations

import numpy as np

from lance_duckdb_spark.operators.quantize import _quantize, ann_sq8_topk
from lance_duckdb_spark.operators.similarity import ann_topk_bruteforce


def test_sq8_equals_bruteforce_bit_exact(spark, sf_dir):
    a = ann_sq8_topk(spark, sf_dir).collect()
    b = ann_topk_bruteforce(spark, sf_dir).collect()
    assert len(a) > 0
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_quantization_error_bound_holds():
    """Property test of the lossless-candidate math: for every pair,
    |quantized cosine - exact cosine| <= eps, where eps is exactly
    the bound the scan computes. 10k random pairs, adversarial
    scales mixed in (tiny and huge magnitudes)."""
    rng = np.random.default_rng(7)
    X = rng.normal(size=(100, 64))
    Y = rng.normal(size=(100, 64))
    X[:25] *= 1e-6
    Y[25:50] *= 1e6
    Xc, s_x = _quantize(X)
    Yc, s_y = _quantize(Y)
    X_hat = Xc.astype(np.float64) / s_x[:, None]
    x_nrm = np.sqrt((X * X).sum(axis=1))
    y_nrm = np.sqrt((Y * Y).sum(axis=1))
    exact = (Y @ X.T) / (y_nrm[:, None] * x_nrm[None, :])
    approx = (Yc @ Xc.T).astype(np.float64) / (
        s_y[:, None] * s_x[None, :]
    ) / (y_nrm[:, None] * x_nrm[None, :])
    eps = (
        (0.5 / s_y)[:, None] * np.abs(X_hat).sum(axis=1)[None, :]
        + (0.5 / s_x)[None, :] * np.abs(Y).sum(axis=1)[:, None]
    ) / (y_nrm[:, None] * x_nrm[None, :])
    eps = eps * (1.0 + 1e-9) + 1e-12
    assert (np.abs(approx - exact) <= eps).all()


def test_codes_are_int8_range_exact_integers():
    rng = np.random.default_rng(11)
    X = rng.normal(size=(50, 64)) * rng.choice([1e-5, 1.0, 1e7], size=(50, 1))
    codes, scales = _quantize(X)
    assert codes.dtype == np.float32
    assert (codes == np.round(codes)).all()  # exact integers
    assert codes.min() >= -127 and codes.max() <= 127
    # per-dim reconstruction error within the advertised 0.5/s
    err = np.abs(X - codes.astype(np.float64) / scales[:, None])
    assert (err <= (0.5 / scales)[:, None] * (1 + 1e-12)).all()


def test_gemm_dtype_guard_and_highdim_bound():
    """Above 1040 dims a float32 GEMM over codes stops being exact
    integer arithmetic (127^2*dim >= 2^24); the scan must switch to
    float64 — verify the switch point and that the bound still holds
    at a production dim (1536)."""
    from lance_duckdb_spark.operators.quantize import (
        SQ8_F32_GEMM_MAX_DIM,
        _gemm_dtype,
    )

    assert SQ8_F32_GEMM_MAX_DIM == 1040
    assert _gemm_dtype(64) == np.float32
    assert _gemm_dtype(1536) == np.float64
    rng = np.random.default_rng(3)
    X = rng.normal(size=(20, 1536))
    Y = rng.normal(size=(20, 1536))
    Xc, s_x = _quantize(X)
    Yc, s_y = _quantize(Y)
    gt = _gemm_dtype(1536)
    X_hat = Xc.astype(np.float64) / s_x[:, None]
    x_nrm = np.sqrt((X * X).sum(axis=1))
    y_nrm = np.sqrt((Y * Y).sum(axis=1))
    denom = y_nrm[:, None] * x_nrm[None, :]
    exact = (Y @ X.T) / denom
    approx = (Yc.astype(gt) @ Xc.astype(gt).T).astype(np.float64) / (
        s_y[:, None] * s_x[None, :]
    ) / denom
    eps = (
        (0.5 / s_y)[:, None] * np.abs(X_hat).sum(axis=1)[None, :]
        + (0.5 / s_x)[None, :] * np.abs(Y).sum(axis=1)[:, None]
    ) / denom
    eps = eps * (1.0 + 1e-9) + 1e-12
    assert (np.abs(approx - exact) <= eps).all()


def test_sq8_indexed_equals_bruteforce_and_store_is_int8(spark, sf_dir):
    """The persisted-store spelling must serve the identical answer,
    and the store must really hold tinyint codes (the 4x tier), the
    exact fold norm, scale and L1 — nothing else."""
    import os

    from lance_duckdb_spark.operators.quantize import ann_sq8_indexed

    a = ann_sq8_indexed(spark, sf_dir).collect()
    b = ann_topk_bruteforce(spark, sf_dir).collect()
    assert len(a) > 0
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    from lance_duckdb_spark.operators.quantize import read_sq8_store

    tag = os.path.basename(str(sf_dir).rstrip("/"))
    store = read_sq8_store(
        spark, os.path.join("/tmp/lance_duckdb_spark", tag, "sq8_store")
    )
    assert dict(store.dtypes) == {
        "vec_id": "bigint",
        "codes": "array<tinyint>",
        "scale": "double",
        "nrm": "double",
        "l1": "double",
    }
    row = store.orderBy("vec_id").first()
    assert all(-127 <= c <= 127 for c in row["codes"])


def test_sq8_store_extend_equals_full_build(spark, sf_dir, tmp_path):
    """Append-maintained store == full-build store, row for row (SQ8
    encoding is per-vector, so extends are exact by construction)."""
    from pyspark.sql import functions as F

    from lance_duckdb_spark.operators.quantize import (
        build_sq8_store,
        extend_sq8_store,
        read_sq8_store,
    )
    from lance_duckdb_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).first()
    cut = lo + ((hi - lo + 1) * 2) // 3
    incr = str(tmp_path / "incr")
    full = str(tmp_path / "full")
    build_sq8_store(spark, emb.where(F.col("vec_id") < cut), incr)
    extend_sq8_store(spark, emb.where(F.col("vec_id") >= cut), incr)
    build_sq8_store(spark, emb, full)
    a = read_sq8_store(spark, incr).orderBy("vec_id").collect()
    b = read_sq8_store(spark, full).orderBy("vec_id").collect()
    assert len(a) > 0
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_sq8_store_crashed_extend_invisible_then_retry_exact(
    spark, sf_dir, tmp_path
):
    """Crash-injection for the staged publish (r9 advice): a part
    written but NOT published (crash between write and meta replace)
    must be invisible to readers, and the subsequent retry must
    serve exactly one copy of the increment — never a double-append."""
    import os

    from pyspark.sql import functions as F

    from lance_duckdb_spark.operators.quantize import (
        _encoded,
        _sq8_parts,
        build_sq8_store,
        extend_sq8_store,
        read_sq8_store,
    )
    from lance_duckdb_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).first()
    cut = lo + ((hi - lo + 1) * 2) // 3
    store = str(tmp_path / "store")
    base = emb.where(F.col("vec_id") < cut)
    incr = emb.where(F.col("vec_id") >= cut)
    build_sq8_store(spark, base, store)
    n_base = read_sq8_store(spark, store).count()
    # simulate the crashed extend: stage the part, skip the publish
    orphan = os.path.join(store, "part_deadbeef")
    _encoded(incr).write.mode("overwrite").parquet(orphan)
    assert read_sq8_store(spark, store).count() == n_base  # invisible
    # the retry
    extend_sq8_store(spark, incr, store)
    served = read_sq8_store(spark, store)
    assert served.count() == emb.count()  # exactly one copy
    assert served.select("vec_id").distinct().count() == emb.count()
    assert "part_deadbeef" not in _sq8_parts(store)


def test_sq8_plan_never_shuffles_vectors(spark, sf_dir):
    from lance_duckdb_spark.plans.checks import executed_plan

    plan = executed_plan(ann_sq8_topk(spark, sf_dir))
    # the only hash exchange carries the slim winner rows into the
    # per-probe window — no embedding column crosses a shuffle
    at = plan.index("MapInPandas")
    assert "embedding" not in plan[:at].split("Scan")[0]
    for seg in plan[:at].split("\n"):
        if "Exchange hashpartitioning" in seg:
            assert "embedding" not in seg
