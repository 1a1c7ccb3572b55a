"""Multimodal column plumbing (driver mandate, BASELINE.json north_star;
beyond the reference's I/O-only surface): image/audio/video as opaque
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

from ..functions.fanout import fanout
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
    ``binaryFile`` or a parquet with a genuine binary column.

    The payload synthesis fans out of the one-task single-row-group scan
    (functions/fanout.py) so the Arrow decode UDF downstream gets a
    parallel partitioning — otherwise every consumer's Python decode ran
    in a single Python worker."""
    d = fanout(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
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


@query(
    "multimodal_decoded_dims",
    oracle="""
    SELECT doc_id,
      CASE WHEN doc_id % 3 = 0 THEN 'image'
           WHEN doc_id % 3 = 1 THEN 'audio'
           ELSE 'video' END AS media_type,
      CAST(16 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64 AS INTEGER) AS width,
      CAST(16 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64 AS INTEGER) AS height,
      CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                ELSE 1 + ('0x' || substr(md5(text), 5, 2))::BIGINT % 30
           END AS INTEGER) AS n_frames
    FROM documents
    """,
)
def multimodal_decoded_dims(spark, sf_dir):
    """The decoded dimensions, WITH a value-level oracle: the fake decoder
    is md5-byte-derived, so DuckDB can reproduce it in SQL and the driver
    hash-checks the mapInPandas pipeline's actual output values (not just
    row counts). This pins the whole Arrow round-trip: binary column in,
    python decode, typed columns out."""
    return extract_media_features(documents_as_media(spark, sf_dir)).select(
        "doc_id", "media_type", "width", "height", "n_frames"
    )


FRAME_EVERY = 5


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH dec AS (
      SELECT doc_id,
        CAST(1 + ('0x' || substr(md5(text), 5, 2))::BIGINT % 30 AS INTEGER) AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, n_frames, CAST(f AS INTEGER) AS frame_idx
    FROM dec, UNNEST(range(n_frames)) AS u(f)
    WHERE f % {FRAME_EVERY} = 0
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling for video payloads: decode ONCE in the Arrow UDF
    (python only where unavoidable), then explode/filter frames JVM-side —
    sequence + explode stay in whole-stage codegen, so sampling density is
    a query knob, not a UDF change. Map-side only, linear in frames."""
    feats = extract_media_features(documents_as_media(spark, sf_dir))
    return (
        feats.filter(F.col("media_type") == "video")
        .select(
            "doc_id",
            "n_frames",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % FRAME_EVERY == 0)
    )


# ------------------------------------------------ audio window energies

N_AUDIO_WINDOWS = 8


def extract_audio_energy(media: DataFrame) -> DataFrame:
    """mapInPandas audio 'decode': per audio payload, emit one array of
    N_AUDIO_WINDOWS window energies. The DETERMINISTIC FAKE derives window
    w's energy from md5(payload) byte 6+w (replace the body with a real
    torchaudio/librosa frame-RMS loop in production); everything around it
    — Arrow batch iteration, array<double> output column, decode-once
    shape — is the real scale plumbing."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            energies = []
            for p in pdf["payload"]:
                h = hashlib.md5(bytes(p)).digest()
                energies.append(
                    [h[6 + w] / 255.0 for w in range(N_AUDIO_WINDOWS)]
                )
            out = pdf[["doc_id"]].copy()
            out["energies"] = energies
            yield out

    return media.mapInPandas(op, schema="doc_id bigint, energies array<double>")


@query(
    "multimodal_audio_energy",
    oracle=f"""
    SELECT doc_id, CAST(w AS INTEGER) AS window_idx,
      ('0x' || substr(md5(text), 13 + 2 * w, 2))::BIGINT / 255.0 AS energy
    FROM documents, UNNEST(range({N_AUDIO_WINDOWS})) AS u(w)
    WHERE doc_id % 3 = 1
    """,
)
def multimodal_audio_energy(spark, sf_dir):
    """Windowed audio-energy extraction, VALUE-gated end to end: the Arrow
    UDF decodes each audio payload once into an energy array; the
    per-window explode happens JVM-side (posexplode in codegen), so window
    granularity is a query knob, not a UDF change. The fake decode is
    md5-byte-derived, so the oracle reproduces the actual doubles and the
    gate hash-checks the full binary -> Arrow -> array -> explode path.
    Map-side after the scale-adaptive fan-out in documents_as_media
    (identity at cluster scale); linear in audio bytes."""
    media = documents_as_media(spark, sf_dir).filter(
        F.col("media_type") == "audio"
    )
    dec = extract_audio_energy(media)
    return dec.select(
        "doc_id", F.posexplode("energies").alias("window_idx", "energy")
    )


VIT_PATCH = 16


@query(
    "multimodal_vit_patch_budget",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
        CAST(16 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64 AS INTEGER) AS w,
        CAST(16 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64 AS INTEGER) AS h
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_images,
      CAST(SUM((w // {VIT_PATCH}) * (h // {VIT_PATCH})) AS BIGINT) AS total_patches,
      CAST(MAX((w // {VIT_PATCH}) * (h // {VIT_PATCH})) AS INTEGER) AS max_patches,
      round(CAST(SUM((w // {VIT_PATCH}) * (h // {VIT_PATCH})) AS DOUBLE)
            / COUNT(*), 8) AS avg_patches
    FROM dims
    """,
)
def multimodal_vit_patch_budget(spark, sf_dir):
    """ViT token budgeting for the image corpus: each image contributes
    (w//{VIT_PATCH}) * (h//{VIT_PATCH}) patches, and the budget report is
    what sizes a vision-encoder training job (patches ~= tokens). Dims
    come from the SAME Arrow-UDF decode as multimodal_decoded_dims —
    decode once, derive budgets JVM-side — and the md5-derived fake means
    the oracle value-checks the whole path. One scalar aggregate."""
    feats = extract_media_features(documents_as_media(spark, sf_dir)).filter(
        F.col("media_type") == "image"
    )
    patches = (
        F.floor(F.col("width") / VIT_PATCH) * F.floor(F.col("height") / VIT_PATCH)
    ).cast("bigint")
    return feats.select(patches.alias("p")).agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("p").alias("total_patches"),
        F.max("p").cast("int").alias("max_patches"),
        F.round(F.sum("p").cast("double") / F.count(F.lit(1)), 8).alias("avg_patches"),
    )


# --------------------------------- payload fingerprint dedup groups

FP_PREFIX_BYTES = 64


@query(
    "multimodal_prefix_fingerprint_groups",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
        md5(substr(text, 1, {FP_PREFIX_BYTES})) AS prefix_hash,
        md5(text) AS full_hash
      FROM documents
    )
    SELECT prefix_hash, COUNT(*)::BIGINT AS n_payloads,
      MIN(doc_id) AS canonical_doc_id,
      (COUNT(DISTINCT full_hash) = 1) AS byte_identical
    FROM m GROUP BY prefix_hash
    HAVING COUNT(*) > 1
    """,
)
def multimodal_prefix_fingerprint_groups(spark, sf_dir):
    """Lead-chunk fingerprint grouping on BINARY payloads: md5 of the
    first {FP_PREFIX_BYTES} bytes clusters payloads sharing a header/
    lead segment (re-encoded copies, same-source crops, truncated
    re-uploads), with a `byte_identical` flag from the full-payload
    hash saying whether each group is an exact-dup set or only a
    shared-prefix candidate needing byte-range verify. This is the
    multimodal analogue of the text side's shingle prefix filters:
    hash a cheap slice first, verify bytes only inside groups.

    Both hashes are computed JVM-side on the binary column; the
    shuffle carries 16-byte digests, never payloads. (The synthetic
    payload is the utf-8 bytes of ascii text, so DuckDB's substr over
    characters sees the same byte slice.)"""
    m = documents_as_media(spark, sf_dir).select(
        "doc_id",
        F.md5(F.expr(f"substring(payload, 1, {FP_PREFIX_BYTES})")).alias(
            "prefix_hash"
        ),
        F.md5("payload").alias("full_hash"),
    )
    return (
        m.groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_payloads"),
            F.min("doc_id").alias("canonical_doc_id"),
            (F.count_distinct("full_hash") == 1).alias("byte_identical"),
        )
        .filter(F.col("n_payloads") > 1)
    )


# --------------------------------------------- storage-planning report


@query(
    "multimodal_storage_report",
    oracle="""
    WITH m AS (
      SELECT
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END AS media_type,
        strlen(text)::BIGINT AS n_bytes
      FROM documents
    ),
    t AS (SELECT SUM(n_bytes)::BIGINT AS tb FROM m),
    g AS (
      SELECT media_type, COUNT(*)::BIGINT AS n_items,
        SUM(n_bytes)::BIGINT AS total_bytes,
        MAX(n_bytes)::BIGINT AS max_bytes,
        list_sort(list(n_bytes)) AS bs
      FROM m GROUP BY media_type
    )
    SELECT media_type, n_items, total_bytes,
      round(CAST(total_bytes AS DOUBLE) / n_items, 4) AS mean_bytes,
      bs[CAST(ceil(n_items * 0.5) AS BIGINT)] AS p50_bytes,
      bs[CAST(ceil(n_items * 0.99) AS BIGINT)] AS p99_bytes,
      max_bytes,
      round(CAST(total_bytes AS DOUBLE) / tb, 8) AS byte_share
    FROM g CROSS JOIN t
    """,
)
def multimodal_storage_report(spark, sf_dir):
    """Storage-planning report per modality: item counts, total/mean/
    exact-p50/p99/max payload bytes and each modality's share of
    corpus bytes — the numbers that size shard bytes
    (webdataset_shard_manifest), pick `maxPartitionBytes`, and decide
    which modality pays for a dedicated store. n_bytes is metadata
    (octet_length), so the report never deserializes a payload; the
    exact per-modality percentiles use the bounded-group sorted-array
    recipe (3 modalities; at petabyte counts switch the percentile to
    the distinct-value prefix-sum kernel)."""
    m = documents_as_media(spark, sf_dir)
    t = F.broadcast(
        m.agg(F.sum("n_bytes").cast("bigint").alias("tb"))
    )
    g = m.groupBy("media_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.max("n_bytes").cast("bigint").alias("max_bytes"),
        F.sort_array(F.collect_list(F.col("n_bytes").cast("bigint"))).alias(
            "bs"
        ),
    )
    return g.crossJoin(t).select(
        "media_type",
        "n_items",
        "total_bytes",
        F.round(
            F.col("total_bytes").cast("double") / F.col("n_items"), 4
        ).alias("mean_bytes"),
        F.element_at(
            "bs", F.ceil(F.col("n_items") * 0.5).cast("int")
        ).alias("p50_bytes"),
        F.element_at(
            "bs", F.ceil(F.col("n_items") * 0.99).cast("int")
        ).alias("p99_bytes"),
        "max_bytes",
        F.round(
            F.col("total_bytes").cast("double") / F.col("tb"), 8
        ).alias("byte_share"),
    )


# ------------------------------------- compressibility quality signal

COMPRESS_SCHEMA = "doc_id bigint, n_bytes int, n_compressed int, ratio double"


@query("text_compressibility_ratio")  # rows-only: zlib has no SQL oracle
def text_compressibility_ratio(spark, sf_dir):
    """Per-document zlib compressibility: compressed_size/raw_size as a
    quality signal — highly repetitive or templated text compresses far
    below ~0.6, while natural prose sits higher; it is the cheapest
    "is this document mostly one pattern?" detector and a standard
    pretraining filter alongside text_repetition_signals (which counts
    specific repeat shapes; this one integrates them all). No SQL
    oracle exists for zlib, so the driver records a rows-only check;
    the VALUE contract is pinned by tests/test_operators.py
    (monotonicity: repeated text < shuffled-vocab text, ratio bounds,
    and exact zlib agreement on a fixture).

    Spark shape: mapInPandas over Arrow batches (the same
    vectorized-Python lane as the media decoders — zlib releases the
    GIL, so executor threads overlap), map-side only, no shuffle; the
    payload column never leaves the executor."""
    m = documents_as_media(spark, sf_dir).select(
        "doc_id", "payload", "n_bytes"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            comp = b["payload"].map(
                lambda p: len(zlib.compress(bytes(p), 6))
            )
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "n_bytes": b["n_bytes"],
                    "n_compressed": comp,
                    "ratio": (comp / b["n_bytes"]).round(8),
                }
            )

    return m.mapInPandas(op, COMPRESS_SCHEMA)


# ------------------------------------------------ image-caption pairing

# CLIP/LAION-style pair construction: every image joins its caption
# document (here: the next doc_id — standing in for the crawl's alt-text
# key), kept only when the caption passes the quality gate and fits the
# token budget. The join/filter/budget shape is the real pipeline; only
# the pairing key is synthetic.
CAPTION_MAX_TOKENS = 64
CAPTION_MIN_QUALITY = 0.5


@query(
    "multimodal_caption_pairs",
    oracle=None,  # set below to reuse scoring's shared CTE
)
def multimodal_caption_pairs(spark, sf_dir):
    """(image_doc, caption_doc) training pairs with caption stats.

    Scale shape: media and caption sides are both doc_id-keyed
    projections of the corpus; the pairing is one equi-join on the
    derived caption key (co-partitionable), the quality gate is map-side,
    and the image payload itself never moves — only its id and byte size.
    At 100 TB the caption side would pre-filter before the join, exactly
    as written here."""
    from .scoring import quality_score_col

    media = documents_as_media(spark, sf_dir).filter(
        F.col("media_type") == "image"
    )
    d = table(spark, sf_dir, "documents")
    captions = d.select(
        F.col("doc_id").alias("caption_doc"),
        F.size(F.split("text", " ")).alias("caption_tokens"),
        quality_score_col().alias("caption_quality"),
    ).filter(
        (F.col("caption_quality") >= CAPTION_MIN_QUALITY)
        & (F.col("caption_tokens") <= CAPTION_MAX_TOKENS)
    )
    return (
        media.select(
            F.col("doc_id").alias("image_doc"),
            (F.col("doc_id") + 1).alias("caption_key"),
            "n_bytes",
        )
        .join(captions, F.col("caption_key") == F.col("caption_doc"))
        .select(
            "image_doc",
            "caption_doc",
            "n_bytes",
            "caption_tokens",
            "caption_quality",
        )
    )


def _register_caption_oracle():
    from ..plans.registry import ORACLES
    from .scoring import _SCORED_SQL

    ORACLES["multimodal_caption_pairs"] = f"""
    WITH {_SCORED_SQL},
    media AS (
      SELECT doc_id AS image_doc, doc_id + 1 AS caption_key,
        CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
      FROM documents WHERE doc_id % 3 = 0
    ),
    captions AS (
      SELECT d.doc_id AS caption_doc,
        CAST(len(string_split(d.text, ' ')) AS INTEGER) AS caption_tokens,
        s.quality_score AS caption_quality
      FROM documents d JOIN scored s ON s.doc_id = d.doc_id
      WHERE s.quality_score >= {CAPTION_MIN_QUALITY}
        AND len(string_split(d.text, ' ')) <= {CAPTION_MAX_TOKENS}
    )
    SELECT image_doc, caption_doc, n_bytes, caption_tokens, caption_quality
    FROM media JOIN captions ON caption_key = caption_doc
    """


_register_caption_oracle()


# ------------------------------------------------ resize / aspect bucketing

RESIZE_LONG_SIDE = 224  # target long side (ViT-style), never upscale
RESIZE_SNAP = 8  # output dims snap down to a multiple of this
AR_Q = 4  # aspect-ratio bucket granularity: quarter units of w/h


@query(
    "multimodal_resize_plan",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'video' END AS media_type,
        CAST(16 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64 AS BIGINT) AS width,
        CAST(16 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64 AS BIGINT) AS height
      FROM documents WHERE doc_id % 3 <> 1
    ),
    planned AS (
      SELECT doc_id, media_type, width, height,
        greatest(width, height) AS long_side,
        CASE WHEN greatest(width, height) <= {RESIZE_LONG_SIDE}
             THEN width
             ELSE greatest({RESIZE_SNAP},
               (width * {RESIZE_LONG_SIDE}) // greatest(width, height)
                 // {RESIZE_SNAP} * {RESIZE_SNAP}) END AS out_width,
        CASE WHEN greatest(width, height) <= {RESIZE_LONG_SIDE}
             THEN height
             ELSE greatest({RESIZE_SNAP},
               (height * {RESIZE_LONG_SIDE}) // greatest(width, height)
                 // {RESIZE_SNAP} * {RESIZE_SNAP}) END AS out_height
      FROM dims
    )
    SELECT doc_id, media_type,
      CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
      CAST(out_width AS INTEGER) AS out_width,
      CAST(out_height AS INTEGER) AS out_height,
      CASE WHEN long_side > {RESIZE_LONG_SIDE} THEN TRUE ELSE FALSE END
        AS resized,
      CAST(least(16, greatest(1,
        ({AR_Q} * 2 * width + height) // (2 * height))) AS INTEGER)
        AS ar_bucket_q
    FROM planned
    """,
)
def multimodal_resize_plan(spark, sf_dir):
    """Resize planning + aspect-ratio bucketing for visual payloads: clamp
    the long side to {RESIZE_LONG_SIDE}px (never upscale), snap output dims
    down to multiples of {RESIZE_SNAP} (conv/patch-stride alignment), and
    assign each item an aspect-ratio bucket in quarter units (floor(4*w/h
    + 1/2), clamped to [1,16]) — the SDXL-style bucketing that lets a
    trainer batch same-shape items instead of padding to the corpus max.

    The PLAN is computed engine-side from the decoded metadata in pure
    integer arithmetic (bit-identical across engines — no float rounding
    at bucket boundaries); the pixel-level resample itself belongs in the
    same Arrow mapInPandas pass as the decode (extract_media_features),
    which this plan parameterizes. Map-side only: no shuffle, no UDF, one
    scan over the feature table."""
    feats = extract_media_features(documents_as_media(spark, sf_dir))
    return _resize_plan(feats.filter(F.col("media_type") != "audio"))


def _resize_plan(feats):
    """Shared resize-plan kernel over (doc_id, media_type, width, height)
    rows — split out so tests can drive it with synthetic dims (the sf
    fixture's fake decode never exceeds the no-upscale threshold)."""
    w = F.col("width").cast("bigint")
    h = F.col("height").cast("bigint")
    long_side = F.greatest(w, h)

    def snapped(side):
        return F.greatest(
            F.lit(RESIZE_SNAP).cast("bigint"),
            F.expr(
                f"((CAST({side} AS BIGINT) * {RESIZE_LONG_SIDE}) "
                f"div greatest(CAST(width AS BIGINT), CAST(height AS BIGINT))) "
                f"div {RESIZE_SNAP} * {RESIZE_SNAP}"
            ),
        )

    return (
        feats
        .select(
            "doc_id",
            "media_type",
            "width",
            "height",
            F.when(long_side <= RESIZE_LONG_SIDE, w)
            .otherwise(snapped("width"))
            .cast("int")
            .alias("out_width"),
            F.when(long_side <= RESIZE_LONG_SIDE, h)
            .otherwise(snapped("height"))
            .cast("int")
            .alias("out_height"),
            (long_side > RESIZE_LONG_SIDE).alias("resized"),
            F.least(
                F.lit(16).cast("bigint"),
                F.greatest(
                    F.lit(1).cast("bigint"),
                    F.expr(
                        f"({AR_Q} * 2 * CAST(width AS BIGINT) + CAST(height AS BIGINT)) "
                        "div (2 * CAST(height AS BIGINT))"
                    ),
                ),
            )
            .cast("int")
            .alias("ar_bucket_q"),
        )
    )


@query(
    "multimodal_ar_bucket_padding",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
        CAST(16 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64 AS BIGINT) AS width,
        CAST(16 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64 AS BIGINT) AS height
      FROM documents WHERE doc_id % 3 <> 1
    ),
    planned AS (
      SELECT doc_id, width, height,
        CASE WHEN greatest(width, height) <= {RESIZE_LONG_SIDE}
             THEN width
             ELSE greatest({RESIZE_SNAP},
               (width * {RESIZE_LONG_SIDE}) // greatest(width, height)
                 // {RESIZE_SNAP} * {RESIZE_SNAP}) END AS ow,
        CASE WHEN greatest(width, height) <= {RESIZE_LONG_SIDE}
             THEN height
             ELSE greatest({RESIZE_SNAP},
               (height * {RESIZE_LONG_SIDE}) // greatest(width, height)
                 // {RESIZE_SNAP} * {RESIZE_SNAP}) END AS oh,
        least(16, greatest(1,
          ({AR_Q} * 2 * width + height) // (2 * height))) AS ar_bucket_q
      FROM dims
    ),
    g AS (SELECT MAX(ow) AS gw, MAX(oh) AS gh, SUM(ow * oh) AS guse,
                 COUNT(*) AS gn FROM planned),
    per_bucket AS (
      SELECT ar_bucket_q, COUNT(*) AS n_items,
        MAX(ow) AS max_w, MAX(oh) AS max_h,
        SUM(ow * oh) AS useful
      FROM planned GROUP BY 1
    )
    SELECT CAST(b.ar_bucket_q AS INTEGER) AS ar_bucket_q,
      b.n_items,
      CAST(b.max_w AS INTEGER) AS max_w, CAST(b.max_h AS INTEGER) AS max_h,
      round(1.0 - CAST(b.useful AS DOUBLE)
            / (b.n_items * b.max_w * b.max_h), 8) AS pad_frac_bucketed,
      round(1.0 - CAST(g.guse AS DOUBLE) / (g.gn * g.gw * g.gh), 8)
        AS pad_frac_global
    FROM per_bucket b CROSS JOIN g
    """,
)
def multimodal_ar_bucket_padding(spark, sf_dir):
    """Quantifies what aspect-ratio bucketing BUYS: per bucket, the padding
    fraction when each batch pads only to its bucket's max dims, next to
    the padding fraction the trainer pays if every item pads to the global
    max (the naive collate). The gap is wasted pixels = wasted FLOPs; this
    report is the evidence for (or against) enabling bucketing on a corpus.

    All areas are exact integers off the resize plan; the global roll-up is
    a broadcast 1-row aggregate cross-joined onto the bucket-sized table
    (the repo's attach-a-global-scalar pattern) — one scan, one tiny
    shuffle, no row explosion."""
    plan = multimodal_resize_plan(spark, sf_dir).select(
        "ar_bucket_q",
        F.col("out_width").cast("bigint").alias("ow"),
        F.col("out_height").cast("bigint").alias("oh"),
    )
    g = F.broadcast(
        plan.agg(
            F.max("ow").alias("gw"),
            F.max("oh").alias("gh"),
            F.sum(F.col("ow") * F.col("oh")).alias("guse"),
            F.count(F.lit(1)).alias("gn"),
        )
    )
    per_bucket = plan.groupBy("ar_bucket_q").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.max("ow").alias("max_w"),
        F.max("oh").alias("max_h"),
        F.sum(F.col("ow") * F.col("oh")).alias("useful"),
    )
    return per_bucket.crossJoin(g).select(
        F.col("ar_bucket_q").cast("int").alias("ar_bucket_q"),
        "n_items",
        F.col("max_w").cast("int").alias("max_w"),
        F.col("max_h").cast("int").alias("max_h"),
        F.round(
            F.lit(1.0)
            - F.col("useful").cast("double")
            / (F.col("n_items") * F.col("max_w") * F.col("max_h")),
            8,
        ).alias("pad_frac_bucketed"),
        F.round(
            F.lit(1.0)
            - F.col("guse").cast("double") / (F.col("gn") * F.col("gw") * F.col("gh")),
            8,
        ).alias("pad_frac_global"),
    )


# ------------------------------ interleaved image-text context packing

MM_BUDGET = 512  # context length in unified tokens (text tokens + patches)


@query(
    "multimodal_interleaved_packing",
    oracle=f"""
    WITH costs AS (
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS t_tokens,
        CAST(CASE WHEN doc_id % 3 = 0 THEN
          ((16 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64) // {VIT_PATCH})
          * ((16 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64) // {VIT_PATCH})
        ELSE 0 END AS BIGINT) AS patches
      FROM documents
    ),
    packed AS (
      SELECT doc_id, t_tokens, patches, t_tokens + patches AS cost,
        CAST((SUM(t_tokens + patches) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - (t_tokens + patches)) // {MM_BUDGET} AS BIGINT) AS context_id
      FROM costs
    )
    SELECT context_id,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN patches > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_images,
      CAST(SUM(t_tokens) AS BIGINT) AS text_tokens,
      CAST(SUM(patches) AS BIGINT) AS image_patches,
      CAST(SUM(cost) AS BIGINT) AS total_cost,
      CAST(SUM(cost) > {MM_BUDGET} AS BOOLEAN) AS overfull
    FROM packed GROUP BY context_id
    """,
)
def multimodal_interleaved_packing(spark, sf_dir):
    """Interleaved image-text context packing — the VLM training-batch
    shape: every document costs text tokens PLUS ViT patches for its image
    payload (patches ~= tokens in the unified sequence), and documents
    pack into MM_BUDGET-token contexts by cumulative cost in doc_id order
    (the same start-offset cumsum rule as pack_chunks_into_contexts, so a
    straddling document overfills its context rather than splitting — the
    audit flags those). Per context: doc/image counts, the text/patch
    token split, and the overflow flag.

    Scale shape: image dims come from the decode-once Arrow UDF
    (extract_media_features — the md5-derived fake lets the oracle
    value-check the whole binary path); the global running cost uses the
    bucketed prefix-sum kernel (functions/prefix.py), NOT an unpartitioned
    window, so no row-level single-partition sort exists in the plan; the
    context rollup is one shuffle on context_id."""
    from ..functions.prefix import bucketed_prefix_sums

    feats = extract_media_features(documents_as_media(spark, sf_dir)).select(
        "doc_id",
        F.when(
            F.col("media_type") == "image",
            (
                F.floor(F.col("width") / VIT_PATCH)
                * F.floor(F.col("height") / VIT_PATCH)
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("patches"),
    )
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("t_tokens")
    )
    # The prefix-sum kernel evaluates costs in three separate executions;
    # it persists its input internally (functions/prefix.py, round-12) so
    # the Arrow image-decode UDF runs once, not three times.
    costs = toks.join(feats, "doc_id").select(
        "doc_id",
        "t_tokens",
        "patches",
        (F.col("t_tokens") + F.col("patches")).alias("cost"),
    )
    packed = bucketed_prefix_sums(costs, "doc_id", ["cost"]).select(
        "doc_id",
        "t_tokens",
        "patches",
        "cost",
        F.floor((F.col("cum_cost") - F.col("cost")) / MM_BUDGET)
        .cast("bigint")
        .alias("context_id"),
    )
    return packed.groupBy("context_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("patches") > 0).cast("int")).cast("bigint").alias("n_images"),
        F.sum("t_tokens").cast("bigint").alias("text_tokens"),
        F.sum("patches").cast("bigint").alias("image_patches"),
        F.sum("cost").cast("bigint").alias("total_cost"),
        (F.sum("cost") > MM_BUDGET).alias("overfull"),
    )
