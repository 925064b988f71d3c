"""Engine-vs-oracle equality over a corpus that CONTAINS NULL text.

The driver testdata has no NULL documents, so the r5 review's
NULL-divergence class (size(split(NULL)) = -1, concat_ws over NULL,
Python len(None) crashes) was latent. This suite rebuilds a corpus
with planted NULL-text rows and runs the affected operators through
the SAME comparator as the driver — both engines must agree on the
aligned semantics (NULL documents are dropped / NULL-propagated).
"""

from __future__ import annotations

import shutil

import pytest

from lance_duckdb_spark.registry import ORACLE_REGISTRY, QUERY_REGISTRY
from lance_duckdb_spark.tables import TABLES

from .oracle import compare, duckdb_connection

AFFECTED = [
    "repetition_filter",
    "sequence_packing",
    "cross_source_overlap",
    "leakage_safe_split",
    "lang_id",
    "token_count",
    "quality_score",
    "multimodal_pipeline",
    "ngram_jaccard",
    "char_entropy",
    "text_normalize",
    "doc_fingerprint",
    # r7: the redaction/provenance pair (size(regexp_extract_all(
    # NULL)) vs len(NULL) must agree through the SUMs) and the
    # contamination scan after its move onto the shared _gram_rows
    # scaffold
    "pii_redact",
    "url_domain_stats",
    "contamination_check",
]


@pytest.fixture(scope="module")
def null_corpus(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("nulltext")
    for t in TABLES:
        if t == "documents":
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
            docs.loc[docs.index[:3], "text"] = None
            docs.to_parquet(str(root / "documents.parquet"))
        else:
            shutil.copy(f"{sf_dir}/{t}.parquet", str(root / f"{t}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", AFFECTED)
def test_operator_matches_oracle_with_null_text(name, spark, null_corpus):
    con = duckdb_connection(null_corpus)
    try:
        df = QUERY_REGISTRY[name](spark, null_corpus)
        compare(df, con, ORACLE_REGISTRY[name], f"{name}@nulltext")
    finally:
        con.close()
