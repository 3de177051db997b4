"""Multimodal column plumbing (SURVEY.md §7 M4 — engine extension).

Image/audio/video travel as opaque ``binary`` payloads with typed
metadata (``schemas.MEDIA``). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, ``mapInPandas`` signatures — is real
and tested; the actual codec step is STUBBED: the image/audio libraries
(Pillow, torchaudio, ffmpeg) are not in this container, so ``decode``
raises ``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake decoder (payload-hash-seeded) that preserves every
contract the real one would have.

Batching contract: ``mapInPandas`` receives Arrow record batches; media
payloads dominate memory, so callers should
``spark.sql.execution.arrow.maxRecordsPerBatch`` -tune (default 10k rows
is far too many for 4K frames — 64 is a sane start) and pre-partition by
size bands to keep batches balanced.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feat_dim", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _real_decode(payload: bytes, kind: str, mime: str):  # pragma: no cover
    raise NotImplementedError(
        "media codecs (Pillow/ffmpeg/torchaudio) are not available in this "
        "environment; run with fake=True for the deterministic stub"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: sha256 of the
    payload expanded to `dim` floats in [0,1). Stable across runs and
    partitionings, so downstream tests are exact.

    The block counter is appended as ASCII digits (``b"0"``, ``b"1"``,
    ...) rather than packed bytes so an external SQL engine can replay
    the construction — DuckDB's ``sha256`` takes VARCHAR only, and this
    is what lets the ``multimodal_fake_features`` catalog query carry a
    full value-hash oracle instead of a rows-only check."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + str(counter).encode()).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return [float(round(x, 6)) for x in out[:dim]]


def extract_features(df: DataFrame, fake: bool = False, dim: int = FEATURE_DIM) -> DataFrame:
    """media rows -> (media_id, kind, feat_dim, features) via mapInPandas.

    The per-batch loop is the real Arrow plumbing; only the innermost
    decode call is stubbed (see module docstring).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind, mime in zip(pdf["payload"], pdf["kind"], pdf["mime"]):
                raw = bytes(payload) if payload is not None else b""
                if fake:
                    feats.append(_fake_features(raw, dim))
                else:
                    feats.append(_real_decode(raw, kind, mime))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_dim": dim,
                    "features": feats,
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("feat_dim", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )
    return df.select("media_id", "kind", "mime", "payload").mapInPandas(run, schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes per-row frame timestamps to
    extract (metadata math only — pure expressions); the decode of each
    frame is the stubbed step. Returns one row per (media_id, frame_ts_ms)."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Aspect-preserving resize *plan*: target (new_w, new_h) per image
    so the longer side becomes ``max_side`` (never upscales) — pure
    integer/metadata expressions; the pixel resample itself is the
    stubbed codec step. floor(dim·max_side/long_side) matches the
    formula every thumbnailer uses; both dims stay ≥ 1."""
    long_side = F.greatest(F.col("width"), F.col("height"))
    scale = F.lit(max_side)
    needs = long_side > scale

    def tgt(dim):
        return F.when(
            needs,
            F.greatest(F.floor(F.col(dim) * scale / long_side), F.lit(1)),
        ).otherwise(F.col(dim)).cast("long")

    return df.withColumn("new_w", tgt("width")).withColumn("new_h", tgt("height"))
