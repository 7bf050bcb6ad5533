"""Multimodal-column operators (SURVEY §2.4 mandate) — binary payloads
with typed metadata.

The driver corpus has no real image/audio bytes, so the *decode* step is
a clearly-marked deterministic stub (see `decode_stub_batch`); everything
around it — binary columns, byte-level metadata, Arrow-batched
mapInPandas plumbing, frame-sampling expansion — is real Spark and
tested. Swapping the stub for PIL/ffmpeg is a one-function change; the
schema, partitioning and batch shape stay as-is.

At 100 TB: binary payloads stay columnar in parquet (never shuffled
unless an operator needs the bytes); metadata extraction is map-only;
mapInPandas streams Arrow batches so peak memory is one batch per core,
not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register


@register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           md5(text) AS content_md5,
           substr(text, 1, 1) AS magic_prefix
    FROM documents
    """,
    doc="Multimodal: binary payload metadata — byte length, content hash, "
    "magic-byte prefix. Map-only; the payload column is pruned from "
    "every downstream plan that doesn't touch the bytes.",
)
def q_mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        F.substring("text", 1, 1).alias("magic_prefix"),
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, unnest(range(0, CAST(n_chars // 100 AS BIGINT) + 1)) AS frame_idx
    FROM documents
    """,
    doc="Multimodal: frame-sampling expansion — one row per sampled frame "
    "of a (simulated) video payload, frame count derived from payload "
    "size. sequence+explode; the expansion happens executor-side, "
    "never on the driver.",
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    frames = F.sequence(F.lit(0).cast("bigint"), (F.col("n_chars") / 100).cast("bigint"))
    return d.select("doc_id", F.explode(frames).alias("frame_idx"))


DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, channels int, feature array<double>"
)


def decode_stub_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 'decode' binary payloads into image metadata +
    a feature vector.

    STUB: the container has no image/audio codecs. A real deployment
    replaces the body below with e.g. PIL.Image.open(io.BytesIO(b)) —
    guarded here so the intent is explicit. The deterministic fake
    derives metadata from the payload bytes so tests have stable
    expectations, and the Arrow batch shape / schema / partitioning are
    exactly what the real decoder would use.
    """
    try:
        import PIL.Image  # noqa: F401 — not installed in this container

        have_codec = True
    except ImportError:
        have_codec = False

    for pdf in batches:
        if have_codec:  # pragma: no cover — codec path not available here
            raise NotImplementedError("real decode path: wire PIL here")
        # NULL-safe: a nullable payload column delivers None to the
        # kernel; treat it like an empty payload instead of crashing the
        # whole query (str.len() -> NaN -> IntCastingNaNError)
        payloads = pdf["payload"]
        n_bytes = payloads.str.len().fillna(0).astype("int32")
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "width": (n_bytes % 640).astype("int32"),
                "height": (n_bytes % 480).astype("int32"),
                "channels": 3,
                "feature": [
                    [float(b[i % len(b)]) / 255.0 for i in range(8)]
                    if b is not None and len(b)
                    else [0.0] * 8
                    for b in payloads
                ],
            }
        )
        yield out


@register(
    "mm_decode_stub",
    oracle=None,  # Python-side stub decode — rows-only check
    doc="Multimodal: Arrow-batched mapInPandas decode plumbing (stubbed "
    "codec). Demonstrates the real UDF signature, schema and batch "
    "iteration; the decode body is a deterministic fake.",
)
def q_mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return d.mapInPandas(decode_stub_batch, DECODE_SCHEMA)


@register(
    "mm_feature_extract",
    oracle="""
    SELECT doc_id,
           """
    + ",\n           ".join(
        f"round(ascii(substr(text, {i + 1}, 1)) / 255.0, 4) AS f{i}" for i in range(8)
    )
    + """
    FROM documents
    """,
    doc="Multimodal: deterministic feature extraction from the payload "
    "prefix (first 8 bytes scaled to [0,1]) — JVM-side, map-only, and "
    "oracle-checked; the real feature extractor (image embedding "
    "model) drops into the decode_stub_batch shell with the same "
    "schema contract. The 8 dims are flattened to scalar columns "
    "f0..f7 (array<double> outputs break the driver's pandas-based "
    "row canonicalizer: unhashable list).",
)
def q_mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    feats = [
        F.round(F.ascii(F.substring("text", i + 1, 1)) / 255.0, 4).alias(f"f{i}")
        for i in range(8)
    ]
    return d.select("doc_id", *feats)


RESIZE_SCHEMA = "doc_id long, width int, height int, target_w int, target_h int, scale double"


def resize_stub_batch(target_w: int, target_h: int):
    """mapInPandas kernel factory: 'resize' decoded frames to a target
    size. STUB (no codecs in this container): emits the geometry the
    real resampler would use; the Arrow batch shape and the
    factory-with-params pattern (how production passes target size into
    the executor-side kernel) are the deliverable."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].clip(lower=1)
            h = pdf["height"].clip(lower=1)
            # vectorized min — Series.combine dispatches a Python call
            # per element (~100x slower per Arrow batch)
            scale = np.minimum(target_w / w, target_h / h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "scale": scale.round(4),
                }
            )

    return kernel


@register(
    "mm_resize_stub",
    oracle=None,  # stubbed geometry-only resize — rows-only check
    doc="Multimodal: resize stage chained after decode — two mapInPandas "
    "stages composing in one plan (decode -> resize), parameterized "
    "kernel via closure factory. Codec-free geometry stub.",
)
def q_mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = q_mm_decode_stub(spark, sf_dir).select("doc_id", "width", "height")
    return decoded.mapInPandas(resize_stub_batch(224, 224), RESIZE_SCHEMA)


@register(
    "mm_phash_dedup",
    oracle="""
    SELECT phash, count(*) AS n_items, min(doc_id) AS keep_doc_id
    FROM (
      SELECT doc_id,
             array_to_string(list_transform(range(1, 9),
               i -> CASE WHEN ascii(substr(text, CAST(i AS INTEGER), 1)) >= 110
                         THEN '1' ELSE '0' END), '') AS phash
      FROM documents
    )
    GROUP BY phash
    """,
    doc="Multimodal near-dup: perceptual-hash dedup — quantize the "
    "payload prefix bytes to above/below-median bits (an aHash analog; "
    "the real image path derives the same bits from DCT coefficients "
    "inside the decode kernel), then hash-groupBy the 8-bit code "
    "keeping min doc_id — identical shuffle shape to dedup_exact but "
    "collapsing *perceptually* equal payloads. Map-only bit "
    "derivation, one partial->final aggregate; at 100 TB the 1-byte "
    "code shuffles instead of megapixel payloads. Hamming-near codes "
    "(1-2 bit flips) extend this with the SimHash prefix-bucket "
    "pattern (operators/dedup.py) unchanged.",
)
def q_mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bits = [
        F.when(F.ascii(F.substring("text", i + 1, 1)) >= 110, "1").otherwise("0")
        for i in range(8)
    ]
    return (
        d.select("doc_id", F.concat(*bits).alias("phash"))
        .groupBy("phash")
        .agg(F.count(F.lit(1)).alias("n_items"), F.min("doc_id").alias("keep_doc_id"))
    )
