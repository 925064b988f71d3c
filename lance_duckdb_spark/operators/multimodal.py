"""Multimodal-column operators (SURVEY.md §2.C12).

Model: media lives in an opaque ``binary`` column with typed
metadata beside it — the same pattern Lance uses for blob columns
(the reference's type map, rust/types.rs, passes binary through
untouched).

The decode stage is a REAL image decoder written from the public
format specs — Netpbm P5/P6 (header + raw samples) and uncompressed
BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 8/24-bit, 4-byte row
padding, bottom-up row order) — no media libraries needed. Since the
test corpus ships no image files, ``as_media_table`` wraps each
document's utf-8 bytes into a genuine P5 PGM payload (the bytes ARE
the grayscale pixels, width=n height=1), so the full pipeline —
synthesize → binary column → Arrow-batched decode → pixel stats —
runs a real parse on every row AND stays oracle-checkable: the
decoded pixel buffer round-trips the text bytes exactly, so
md5(pixels) == DuckDB's md5(text) and n_pixels == octet_length.
Deeper image formats (JPEG/PNG) need entropy decoders; that is where
PIL would slot into ``decode_image``.

Scale: mapInPandas streams Arrow batches (no row-at-a-time Python at
the Spark layer), media bytes never leave the executor, and the
decode stage is a narrow transformation — it pipelines with the scan
at any corpus size.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..tables import load


# --------------------------------------------------------------- #
# image codecs (public format specs; dependency-free)              #
# --------------------------------------------------------------- #


def _pnm_header(buf: bytes, pos: int, n_tokens: int) -> tuple[list[int], int]:
    """Parse ``n_tokens`` whitespace-separated ASCII integers from a
    Netpbm header, honoring ``#`` comments (spec: comments run to
    end-of-line and may appear between any tokens)."""
    out: list[int] = []
    n = len(buf)
    while len(out) < n_tokens:
        while pos < n and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < n and buf[pos] == ord("#"):
            while pos < n and buf[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < n and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        out.append(int(buf[start:pos]))
    return out, pos + 1  # single whitespace after maxval per spec


def decode_image(payload: bytes) -> dict:
    """Decode a PGM (P5), PPM (P6) or uncompressed BMP payload into
    (format, width, height, channels, pixels) where ``pixels`` is
    the raw top-down, unpadded sample buffer.

    Raises ValueError on unknown magic or malformed/truncated data —
    a decoder that silently passes garbage through is worse than one
    that fails loudly.
    """
    if payload[:2] in (b"P5", b"P6"):
        channels = 1 if payload[:2] == b"P5" else 3
        (w, h, maxval), pos = _pnm_header(payload, 2, 3)
        if maxval <= 0 or maxval > 255:
            raise ValueError(f"unsupported PNM maxval {maxval}")
        need = w * h * channels
        pixels = payload[pos : pos + need]
        if len(pixels) != need:
            raise ValueError(
                f"truncated PNM: want {need} bytes, have {len(pixels)}"
            )
        return {
            "format": "pgm" if channels == 1 else "ppm",
            "width": w,
            "height": h,
            "channels": channels,
            "pixels": pixels,
        }
    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        # one unpack covers hdr_size/width/height/planes/bpp/compression
        # (the old double-read of height as unsigned-then-signed invited
        # edits against the wrong value; r8 review)
        hdr_size, w, h_signed, planes, bpp, compression = struct.unpack_from(
            "<IiiHHI", payload, 14
        )
        if (
            hdr_size < 40
            or planes != 1  # BMP spec: always 1; reject malformed loudly
            or compression != 0
            or bpp not in (8, 24)
        ):
            raise ValueError(
                f"unsupported BMP (hdr={hdr_size}, planes={planes}, "
                f"comp={compression}, bpp={bpp}); only uncompressed "
                "single-plane 8/24-bit supported"
            )
        top_down = h_signed < 0
        h = abs(h_signed)
        channels = bpp // 8
        stride = (w * channels + 3) & ~3  # rows pad to 4 bytes
        rows = []
        for r in range(h):
            src_row = r if top_down else h - 1 - r
            start = data_off + src_row * stride
            row = payload[start : start + w * channels]
            if len(row) != w * channels:
                raise ValueError("truncated BMP pixel data")
            rows.append(row)
        return {
            "format": "bmp",
            "width": w,
            "height": h,
            "channels": channels,
            "pixels": b"".join(rows),
        }
    raise ValueError(f"unknown image magic {payload[:2]!r}")


def encode_bmp_gray8(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 8-bit grayscale BMP writer (test fixture helper):
    BITMAPFILEHEADER + BITMAPINFOHEADER + 256-entry gray palette +
    bottom-up 4-byte-padded rows."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    stride = (width + 3) & ~3
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
    data_off = 14 + 40 + len(palette)
    img_size = stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", data_off + img_size, 0, 0, data_off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, img_size, 2835, 2835,
        256, 0,
    )
    rows = []
    for r in range(height - 1, -1, -1):  # bottom-up
        row = pixels[r * width : (r + 1) * width]
        rows.append(row + b"\x00" * (stride - width))
    return header + palette + b"".join(rows)


# --------------------------------------------------------------- #
# Spark pipeline                                                  #
# --------------------------------------------------------------- #


def as_media_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, media_type, n_bytes):
    each text's utf-8 bytes wrapped as a genuine P5 PGM image
    (grayscale pixels = the bytes, width=n height=1), built entirely
    with JVM-side binary concat — no Python in the synthesis path."""
    text_bytes = F.encode("text", "UTF-8")
    header = F.encode(
        F.concat(
            F.lit("P5\n"),
            F.octet_length(text_bytes).cast("string"),
            F.lit(" 1\n255\n"),
        ),
        "UTF-8",
    )
    payload = F.concat(header, text_bytes)
    # NULL text would produce a NULL payload that bytes(None) cannot
    # decode — a NULL document has no media payload; drop in both
    # engines (oracle: WHERE text IS NOT NULL)
    docs = docs.where(F.col("text").isNotNull())
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.concat(F.lit("media/"), F.col("source")).alias("media_type"),
        F.octet_length(payload).alias("n_bytes"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("mean_pixel", DoubleType()),
        StructField("feature_hash", StringType()),
    ]
)


def _decode_batch(batches: Iterator["object"]) -> Iterator["object"]:
    """mapInPandas stage: genuinely decode each payload (PGM/PPM/BMP
    header parse + pixel extraction) and emit per-image features.
    The md5 runs over the DECODED pixel buffer — for the PGM-wrapped
    corpus that equals md5 of the original bytes, which is what
    makes the end-to-end pipeline oracle-checkable in SQL."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        feats = {
            "width": [],
            "height": [],
            "n_pixels": [],
            "mean_pixel": [],
            "feature_hash": [],
        }
        for p in pdf["payload"]:
            img = decode_image(bytes(p))
            px = np.frombuffer(img["pixels"], dtype=np.uint8)
            feats["width"].append(img["width"])
            feats["height"].append(img["height"])
            feats["n_pixels"].append(img["width"] * img["height"])
            feats["mean_pixel"].append(
                float(px.mean()) if px.size else 0.0
            )
            feats["feature_hash"].append(
                hashlib.md5(img["pixels"]).hexdigest()
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "width": pd.Series(feats["width"], dtype="int32"),
                "height": pd.Series(feats["height"], dtype="int32"),
                "n_pixels": pd.Series(feats["n_pixels"], dtype="int64"),
                "mean_pixel": feats["mean_pixel"],
                "feature_hash": feats["feature_hash"],
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
            F.sum("n_pixels").cast("long").alias("total_pixels"),
            F.max("width").alias("max_width"),
            F.countDistinct("feature_hash").alias("n_distinct_features"),
        )
        .orderBy("media_type")
    )


# payload = "P5\n" + str(n) + " 1\n255\n" + text bytes, so
# n_bytes = octet_length(text) + 10 + length(str(octet_length));
# pixels round-trip the text bytes, so md5(pixels) == md5(text) and
# n_pixels == octet_length(text).
MULTIMODAL_SQL = """
SELECT 'media/' || source AS media_type,
  COUNT(*) AS n_items,
  CAST(SUM(
    octet_length(encode(text)) + 10
    + length(CAST(octet_length(encode(text)) AS VARCHAR))
  ) AS BIGINT) AS total_bytes,
  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_pixels,
  MAX(octet_length(encode(text))) AS max_width,
  COUNT(DISTINCT md5(text)) AS n_distinct_features
FROM documents
WHERE text IS NOT NULL
GROUP BY 1
ORDER BY media_type
"""


QUERIES = {"multimodal_pipeline": multimodal_pipeline}
ORACLE = {"multimodal_pipeline": MULTIMODAL_SQL}
