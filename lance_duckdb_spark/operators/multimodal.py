"""Multimodal-column operators (SURVEY.md §2.C12).

Model: media lives in an opaque ``binary`` column with typed
metadata beside it — the same pattern Lance uses for blob columns
(the reference's type map, rust/types.rs, passes binary through
untouched). Spark-side plumbing (schema, partitioning, Arrow batch
shape through mapInPandas) is real and oracle-checked; the actual
codec work (image decode/resize, audio resample, video frame
sampling) is stubbed deterministically because no media libraries
exist in this container — each stub documents exactly where
PIL/ffmpeg would slot in.

Scale: mapInPandas streams Arrow batches (no row-at-a-time Python),
media bytes never leave the executor, and the decode stage is a
narrow transformation — it pipelines with the scan at any corpus
size.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..tables import load


def as_media_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, media_type, n_bytes):
    utf-8 text bytes stand in for an image/audio payload."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.concat(F.lit("media/"), F.col("source")).alias("media_type"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature_hash", StringType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _decode_batch(batches: Iterator["object"]) -> Iterator["object"]:
    """mapInPandas stage: 'decode' each payload and emit features.

    Production body would be:
        img = PIL.Image.open(io.BytesIO(payload)).resize((224, 224))
        feat = model(img)
    Neither PIL nor a model exists here, so the decode is a
    deterministic stand-in (md5 of the bytes; frame count =
    n_bytes // 1000) — which keeps the whole pipeline testable and
    oracle-checkable end-to-end.
    """
    import hashlib

    import pandas as pd

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "feature_hash": [
                    hashlib.md5(bytes(p)).hexdigest() for p in payloads
                ],
                "n_frames": (pdf["n_bytes"] // 1000).astype("int32"),
            }
        )


def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    media = as_media_table(docs)
    feats = media.mapInPandas(_decode_batch, schema=_FEATURE_SCHEMA)
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.countDistinct("feature_hash").alias("n_distinct_features"),
        )
        .orderBy("media_type")
    )


MULTIMODAL_SQL = """
SELECT 'media/' || source AS media_type,
  COUNT(*) AS n_items,
  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  CAST(SUM(octet_length(encode(text)) // 1000) AS BIGINT) AS total_frames,
  COUNT(DISTINCT md5(text)) AS n_distinct_features
FROM documents
GROUP BY 1
ORDER BY media_type
"""


QUERIES = {"multimodal_pipeline": multimodal_pipeline}
ORACLE = {"multimodal_pipeline": MULTIMODAL_SQL}
