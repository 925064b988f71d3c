"""ANN through SQL (r14, r13 VERDICT item 3): lance_sql recognizes
``ORDER BY <cosine expr> DESC LIMIT k`` over a '<path>.lance' scan
and serves it from the persisted IVF index — the DuckDB-UX spelling
of the r13 filtered search (the reference's users type
list_cosine_similarity SQL, not ann_search() calls). Covered here:

- unfiltered and WHERE-filtered serving match ann_search output;
- the served plan keeps bucket partition pruning;
- loud refusals: no index, wrong metric, unservable shape, wrong
  vector/id column, dim mismatch;
- composition with deletion-aware serving (DELETE then SQL search).
"""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.catalog import lance_sql
from lance_duckdb_spark.operators.similarity import IVF_K, TOP_K
from lance_duckdb_spark.sources import lance_format as lf
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.sources.vector_index import (
    ann_search,
    build_ivf_index,
)
from lance_duckdb_spark.tables import load


@pytest.fixture()
def ann_root(spark, sf_dir):
    root = f"/tmp/lance_duckdb_spark/test_sqlann_{uuid.uuid4().hex[:8]}.lance"
    register(spark)
    emb = load(spark, sf_dir, "embeddings")
    emb.select("vec_id", "embedding", "label").write.format("lance").mode(
        "overwrite"
    ).save(root)
    build_ivf_index(spark, root, k=IVF_K, lloyd_iters=2)
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _vec_literal(spark, sf_dir, vec_id=0) -> str:
    emb = load(spark, sf_dir, "embeddings")
    v = emb.where(F.col("vec_id") == vec_id).select("embedding").first()[0]
    return ", ".join(repr(float(x)) for x in v)


def test_sql_ann_matches_ann_search(spark, sf_dir, ann_root):
    lit = _vec_literal(spark, sf_dir)
    got = lance_sql(
        spark,
        f"SELECT vec_id, cosine_similarity(embedding, [{lit}]) AS score "
        f"FROM '{ann_root}' ORDER BY score DESC LIMIT {TOP_K}",
    ).collect()
    assert len(got) == TOP_K
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    want = ann_search(
        spark, ann_root, probes, k_neighbors=TOP_K, nprobe=8,
        exclude_self=False,
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["neighbor_id"], r["cos_sim"]) for r in want
    ]


def test_sql_ann_where_prefilters(spark, sf_dir, ann_root):
    lit = _vec_literal(spark, sf_dir)
    got = lance_sql(
        spark,
        f"SELECT vec_id, list_cosine_similarity(embedding, [{lit}]) AS s "
        f"FROM '{ann_root}' WHERE label IN (2, 5) AND vec_id <> 0 "
        f"ORDER BY s DESC LIMIT {TOP_K}",
    ).collect()
    assert got
    labels = {
        r["vec_id"]: r["label"]
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    for r in got:
        assert labels[r["vec_id"]] in (2, 5)
        assert r["vec_id"] != 0


def test_sql_ann_order_by_full_expression(spark, sf_dir, ann_root):
    lit = _vec_literal(spark, sf_dir)
    expr = f"cosine_similarity(embedding, [{lit}])"
    got = lance_sql(
        spark,
        f"SELECT vec_id, {expr} AS score FROM '{ann_root}' "
        f"ORDER BY {expr} DESC LIMIT 5",
    ).collect()
    assert len(got) == 5


def test_sql_ann_keeps_bucket_pruning(spark, sf_dir, ann_root):
    lit = _vec_literal(spark, sf_dir)
    df = lance_sql(
        spark,
        f"SELECT vec_id, cosine_similarity(embedding, [{lit}]) AS score "
        f"FROM '{ann_root}' WHERE label IN (2, 5) "
        f"ORDER BY score DESC LIMIT {TOP_K}",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "bucket_id" in seg
    assert "LeftSemi" in plan


def test_sql_ann_serves_after_delete(spark, sf_dir, ann_root):
    lance_sql(
        spark, f"DELETE FROM '{ann_root}' WHERE vec_id % 10 = 3"
    ).collect()
    lit = _vec_literal(spark, sf_dir)
    got = lance_sql(
        spark,
        f"SELECT vec_id, cosine_similarity(embedding, [{lit}]) AS score "
        f"FROM '{ann_root}' ORDER BY score DESC LIMIT {TOP_K}",
    ).collect()
    assert got
    assert all(r["vec_id"] % 10 != 3 for r in got)


def test_sql_ann_refuses_without_index(spark, sf_dir):
    root = f"/tmp/lance_duckdb_spark/test_sqlann_noidx_{uuid.uuid4().hex[:8]}.lance"
    register(spark)
    try:
        load(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        ).write.format("lance").mode("overwrite").save(root)
        with pytest.raises(
            lf.LanceDatasetError, match="persisted IVF or IVF_PQ"
        ):
            lance_sql(
                spark,
                f"SELECT vec_id, cosine_similarity(embedding, [0.1, 0.2]) "
                f"AS s FROM '{root}' ORDER BY s DESC LIMIT 5",
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_sql_ann_serves_from_pq_index(spark, sf_dir):
    """With only an IVF_PQ index present (Lance proper's default),
    the SQL sugar serves through ann_search_pq instead of refusing."""
    from lance_duckdb_spark.operators.similarity import IVF_K, TOP_K
    from lance_duckdb_spark.sources.vector_index import build_ivf_pq_index

    root = f"/tmp/lance_duckdb_spark/test_sqlann_pq_{uuid.uuid4().hex[:8]}.lance"
    register(spark)
    try:
        load(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding", "label"
        ).write.format("lance").mode("overwrite").save(root)
        build_ivf_pq_index(spark, root, k=IVF_K, lloyd_iters=2)
        lit = _vec_literal(spark, sf_dir)
        got = lance_sql(
            spark,
            f"SELECT vec_id, cosine_similarity(embedding, [{lit}]) "
            f"AS score FROM '{root}' ORDER BY score DESC LIMIT {TOP_K}",
        ).collect()
        assert len(got) == TOP_K
        # probe 0's own vector ranks itself first (exclude_self=False)
        assert got[0]["vec_id"] == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_sql_ann_refuses_wrong_metric(spark, ann_root):
    with pytest.raises(lf.LanceDatasetError, match="metric"):
        lance_sql(
            spark,
            f"SELECT vec_id, list_distance(embedding, [0.1]) AS d "
            f"FROM '{ann_root}' ORDER BY d DESC LIMIT 5",
        )


def test_sql_ann_refuses_bad_shape(spark, ann_root):
    # ascending order never fits the servable shape
    with pytest.raises(lf.LanceDatasetError, match="ANN SQL serving"):
        lance_sql(
            spark,
            f"SELECT vec_id, cosine_similarity(embedding, [0.1]) AS s "
            f"FROM '{ann_root}' ORDER BY s ASC LIMIT 5",
        )


def test_sql_ann_refuses_wrong_columns_and_dim(spark, sf_dir, ann_root):
    lit = _vec_literal(spark, sf_dir)
    with pytest.raises(lf.LanceDatasetError, match="covers column"):
        lance_sql(
            spark,
            f"SELECT vec_id, cosine_similarity(label, [{lit}]) AS s "
            f"FROM '{ann_root}' ORDER BY s DESC LIMIT 5",
        )
    with pytest.raises(lf.LanceDatasetError, match="id column"):
        lance_sql(
            spark,
            f"SELECT label, cosine_similarity(embedding, [{lit}]) AS s "
            f"FROM '{ann_root}' ORDER BY s DESC LIMIT 5",
        )
    with pytest.raises(lf.LanceDatasetError, match="components"):
        lance_sql(
            spark,
            f"SELECT vec_id, cosine_similarity(embedding, [0.1, 0.2]) "
            f"AS s FROM '{ann_root}' ORDER BY s DESC LIMIT 5",
        )


def test_plain_sql_unaffected(spark, sf_dir, ann_root):
    # no similarity function: the generic read path still works on
    # the same dataset (regression guard for the new dispatch hook)
    n = lance_sql(
        spark, f"SELECT COUNT(*) AS n FROM '{ann_root}'"
    ).collect()[0]["n"]
    assert n > 0


def test_sql_ann_string_literal_does_not_hijack(spark, sf_dir, ann_root):
    """r14 review: a similarity-function name inside a string
    literal must not pull a valid generic query into the ANN shape
    refusal."""
    n = lance_sql(
        spark,
        f"SELECT COUNT(*) AS n FROM '{ann_root}' "
        f"WHERE 'cosine_similarity(' <> 'list_distance('",
    ).collect()[0]["n"]
    assert n > 0


def test_sql_ann_strict_vector_literal(spark, ann_root):
    """r14 review: malformed vector elements refuse instead of
    silently parsing the digits out of them."""
    with pytest.raises(lf.LanceDatasetError, match="not numeric"):
        lance_sql(
            spark,
            f"SELECT vec_id, cosine_similarity(embedding, [0.1, x2, 0.3]) "
            f"AS s FROM '{ann_root}' ORDER BY s DESC LIMIT 5",
        )
    with pytest.raises(lf.LanceDatasetError, match="not numeric"):
        lance_sql(
            spark,
            f"SELECT vec_id, cosine_similarity(embedding, [0.1 0.2]) "
            f"AS s FROM '{ann_root}' ORDER BY s DESC LIMIT 5",
        )


def test_sql_ann_case_insensitive_identifiers(spark, sf_dir, ann_root):
    """r14 review: the sugar must not be stricter than Spark/DuckDB's
    case-insensitive resolution."""
    lit = _vec_literal(spark, sf_dir)
    got = lance_sql(
        spark,
        f"SELECT VEC_ID, COSINE_SIMILARITY(EMBEDDING, [{lit}]) "
        f"AS Score FROM '{ann_root}' ORDER BY SCORE DESC LIMIT 5",
    )
    rows = got.collect()
    assert len(rows) == 5
    # output columns use the index meta's canonical spelling
    assert got.columns == ["vec_id", "Score"]
