"""Multimodal column plumbing (driver mandate): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched pandas
UDFs via ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (clearly marked), but everything Spark-side is real and
tested: the binary column schema, the mapInPandas batch iteration, the
output schema contract, and the partition behavior. Swapping the fake for
PIL/torchaudio is a one-function change.

Scale notes: binary payloads ride the normal columnar path (parquet binary
columns with page compression); feature extraction is map-side only (no
shuffle), so the pipeline is linear in bytes. For very large blobs prefer
``spark.read.format("binaryFile")`` + path-only shuffling.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.registry import query, table

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, n_bytes int, checksum bigint"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, checksum bigint, "
    "width int, height int, n_frames int"
)


def documents_as_media(spark, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal table from documents: the utf-8 bytes of
    ``text`` stand in for an image payload. Real pipelines would read
    ``binaryFile`` or a parquet with a genuine binary column."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        payload.alias("payload"),
        F.octet_length("text").alias("n_bytes"),
        F.crc32(payload).alias("checksum"),
    )


def fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode standing in for PIL/ffmpeg/torchaudio.

    Derives (width, height, n_frames) purely from the payload bytes so tests
    are reproducible. Replace the body with a real decoder in production:

        raise NotImplementedError("install pillow/av and decode here")
    """
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    n_frames = 1 if media_type == "image" else 1 + h[2] % 30
    return width, height, n_frames


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.

    The UDF touches each partition's batches exactly once — this is the
    canonical shape for decode/resize/frame-sample at scale."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_decode(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pdf[["doc_id", "media_type", "n_bytes", "checksum"]].copy()
            out["width"] = [f[0] for f in feats]
            out["height"] = [f[1] for f in feats]
            out["n_frames"] = [f[2] for f in feats]
            yield out

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 3 = 0 THEN 'image'
           WHEN doc_id % 3 = 1 THEN 'audio'
           ELSE 'video' END AS media_type,
      CAST(strlen(text) AS INTEGER) AS n_bytes
    FROM documents
    """,
)
def multimodal_features_meta(spark, sf_dir):
    """Metadata slice of the multimodal pipeline (SQL-checkable part: the
    typed metadata columns). The full binary pipeline incl. fake decode is
    exercised by multimodal_decoded (rows-only check) and tests."""
    m = documents_as_media(spark, sf_dir)
    return m.select("doc_id", "media_type", "n_bytes")


@query("multimodal_decoded")  # no oracle: binary mapInPandas pipeline
def multimodal_decoded(spark, sf_dir):
    """End-to-end binary pipeline: synthesize payloads -> mapInPandas decode
    -> typed features. Deterministic but not ANSI-SQL-expressible (python
    md5-of-binary fake decode), so it takes the driver's rows-only check;
    tests/test_multimodal.py asserts exact values."""
    return extract_media_features(documents_as_media(spark, sf_dir))
