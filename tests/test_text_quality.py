"""Perplexity model-cap behavior (r5): on a multilingual corpus the
distinct-bigram table can reach 10⁷-10⁸ rows, so the model is capped
at the top-K bigrams with an add-1 smoothing floor for the tail
(operators/text.py PPL_MODEL_MAX_ROWS). These tests force the cap to
BIND on the test corpus and assert (a) the broadcast model really is
bounded by the cap and (b) the capped scoring stays bit-identical to
the DuckDB oracle running the same capped semantics — the property
that keeps the driver hash green if a production corpus ever binds
the cap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lance_duckdb_spark.operators import text
from lance_duckdb_spark.tables import load

from .oracle import compare, duckdb_connection

TINY_CAP = 50


def _distinct_bigrams(spark, sf_dir) -> int:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(char_length(lower(trim(text))) - 1, 0)),"
                    " i -> substring(lower(trim(text)), i, 2))"
                )
            ).alias("bg")
        )
        .where(F.length("bg") == 2)
        .distinct()
        .count()
    )


def test_cap_binds_on_this_corpus(spark, sf_dir):
    assert _distinct_bigrams(spark, sf_dir) > TINY_CAP, (
        "corpus has too few distinct bigrams for the cap test to bind"
    )


def test_capped_model_matches_oracle_bit_exact(spark, sf_dir):
    """Both engines run the SAME top-K + smoothing-floor semantics, so
    the driver-style compare must stay EXACT even when most bigrams
    score through the tail path."""
    con = duckdb_connection(sf_dir)
    try:
        df = text.perplexity_score(spark, sf_dir, model_max_rows=TINY_CAP)
        compare(df, con, text.perplexity_sql(TINY_CAP), "perplexity_cap50")
    finally:
        con.close()


def test_default_cap_does_not_bind_here(spark, sf_dir):
    """The production default (64k) leaves an ASCII-ish corpus's model
    uncapped, so r5's restructure cannot change any driver hash."""
    assert _distinct_bigrams(spark, sf_dir) < text.PPL_MODEL_MAX_ROWS
