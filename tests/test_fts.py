"""BM25 full-text search: indexed == direct bit-exact, partition
pruning on the bucket dirs, ranking sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.operators import fts
from lance_duckdb_spark.tables import load


@pytest.fixture(scope="module")
def index_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fts") / "index")
    fts.build_fts_index(spark, load(spark, sf_dir, "documents"), d)
    return d


def test_indexed_equals_direct_bit_exact(spark, sf_dir, index_dir):
    direct = fts.fts_bm25(spark, sf_dir).collect()
    indexed = fts.search_bm25(
        spark, index_dir, list(fts.QUERY_TERMS)
    ).collect()
    assert [r.asDict() for r in direct] == [r.asDict() for r in indexed]


def test_search_prunes_partitions(spark, index_dir):
    """A 1-term query must plan a scan over only that term's bucket
    directory — parquet partition pruning, the property that makes
    the index O(query) not O(corpus) at 100 TB."""
    term = fts.QUERY_TERMS[0]
    df = fts.search_bm25(spark, index_dir, [term])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the FileSourceScan must carry a PartitionFilters entry on bucket
    assert "PartitionFilters" in plan
    bucket = fts.bucket_of(term)
    seg = plan.split("PartitionFilters", 1)[1][:300]
    assert str(bucket) in seg


def test_bucket_expr_matches_python_hash(spark):
    terms = ["spark", "scan", "merge", "window", "the", "a", "zz9"]
    rows = (
        spark.createDataFrame([(t,) for t in terms], ["term"])
        .select("term", fts._bucket_expr(F.col("term")).alias("b"))
        .collect()
    )
    for r in rows:
        assert r.b == fts.bucket_of(r.term), r.term


def test_ranking_sanity(spark, sf_dir):
    """Top-ranked docs must actually contain query terms; scores
    descend; a doc with zero query terms never appears."""
    rows = fts.fts_bm25(spark, sf_dir).collect()
    assert rows, "query terms should match the corpus"
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    docs = {r.doc_id: r for r in rows}
    texts = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id").isin(list(docs)))
        .collect()
    )
    for t in texts:
        toks = set(t.text.lower().split())
        hit = toks & set(fts.QUERY_TERMS)
        assert len(hit) == docs[t.doc_id].n_terms
