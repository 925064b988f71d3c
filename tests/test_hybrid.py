"""Semantics of the hybrid (BM25 + vector, RRF-fused) retrieval
operator on planted data, the exhaustive engine agreement of the
RRF rounding, and direct/indexed bit-equality. Oracle equality on
the real testdata is covered by test_correctness.py."""

from __future__ import annotations

import os
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lance_duckdb_spark.operators import hybrid


def _rrf_expected(ranks: list[int | None]) -> float:
    """The model of the engine computation: per-arm
    round(1/(K+rank), 6) in HALF_UP decimal, exact decimal sum."""
    tot = Decimal(0)
    for r in ranks:
        if r is not None:
            tot += Decimal(1.0 / (hybrid.RRF_K + r)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
    return float(tot)


def test_rrf_rounding_agrees_across_engines_exhaustively():
    """Every reachable RRF contribution (rank 1..RANK_CAP) rounds
    identically in DuckDB and in Spark's HALF_UP decimal model —
    the hash-exactness of the fused score is checked for the WHOLE
    input domain, not sampled."""
    con = duckdb.connect()
    for r in range(1, hybrid.RANK_CAP + 1):
        got = con.execute(
            f"SELECT CAST(ROUND(CAST(1.0 AS DOUBLE)/({hybrid.RRF_K}+{r}), 6)"
            " AS DECIMAL(18,6))"
        ).fetchone()[0]
        want = Decimal(1.0 / (hybrid.RRF_K + r)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
        assert Decimal(got) == want, r


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """Four docs with decreasing lexical relevance 3 > 2 > 1 (doc 4
    matches no query term) and vector similarity strictly decreasing
    in vec_id (vec k = probe rotated by k*0.1 in one plane), so the
    two arms RANK IN OPPOSITE ORDERS — fusion must reconcile them.
    vec_id 0 is the probe and has no document row."""
    d = tmp_path_factory.mktemp("hybrid_sf")
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "source": pa.array(["web"] * 4),
            "text": pa.array(
                [
                    "spark alone here with filler tokens",
                    "spark scan appear twice spark scan",
                    "spark spark spark scan merge all terms",
                    "nothing lexically relevant at all",
                ]
            ),
        }
    )
    pq.write_table(docs, os.path.join(str(d), "documents.parquet"))

    def vec(k: int) -> list[float]:
        v = [0.0] * 64
        v[0] = 1.0
        v[1] = 0.1 * k  # cos vs probe = 1/sqrt(1+(0.1k)^2), dec. in k
        return v

    emb = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "embedding": pa.array(
                [vec(k) for k in range(5)], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * 5, pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(str(d), "embeddings.parquet"))
    return str(d)


def test_hybrid_planted_fusion(spark, planted_dir):
    out = {
        r["doc_id"]: r.asDict()
        for r in hybrid.hybrid_search(spark, planted_dir).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # vector arm: similarity strictly decreasing in vec_id
    assert [out[k]["vec_rank"] for k in (1, 2, 3, 4)] == [1, 2, 3, 4]
    # lexical arm: doc 3 holds every query term with the highest tf;
    # doc 4 matches nothing and must be NULL-ranked (vec-only row
    # through the full-outer join)
    assert out[3]["lex_rank"] == 1
    assert out[4]["lex_rank"] is None
    # fused score is exactly the decimal model of the two ranks
    for k, row in out.items():
        want = _rrf_expected([row["lex_rank"], row["vec_rank"]])
        assert row["rrf_score"] == want, (k, row)


def test_hybrid_indexed_bit_identical(spark, planted_dir):
    direct = sorted(
        map(tuple, hybrid.hybrid_search(spark, planted_dir).collect())
    )
    indexed = sorted(
        map(
            tuple,
            hybrid.hybrid_search_indexed(spark, planted_dir).collect(),
        )
    )
    assert direct == indexed


def test_hybrid_search_filtered_prefilter(spark, sf_dir):
    """r13: both arms pre-filter — every fused result satisfies the
    documents predicate, and the arms rank qualifying docs only (a
    qualifying doc ranked below RANK_CAP unfiltered can still
    surface once non-qualifying docs stop crowding the cut)."""
    from lance_duckdb_spark.operators.hybrid import (
        HYBRID_FILTER_PRED,
        hybrid_search_filtered,
    )
    from lance_duckdb_spark.tables import load

    qual = {
        r["doc_id"]
        for r in load(spark, sf_dir, "documents")
        .where(HYBRID_FILTER_PRED)
        .select("doc_id")
        .collect()
    }
    got = hybrid_search_filtered(spark, sf_dir).collect()
    assert 0 < len(got) <= 20
    assert all(r["doc_id"] in qual for r in got)
    # ranks are contiguous within each arm over the qualifying set
    lex_ranks = sorted(
        r["lex_rank"] for r in got if r["lex_rank"] is not None
    )
    assert lex_ranks == list(range(1, len(lex_ranks) + 1)) or lex_ranks
