"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing — schema, partition-friendly layout, Arrow-batched
``mapInPandas`` UDF signatures and batch shapes — is real and tested, and so
is the codec step for every library-free format: WAV (PCM16), BMP (24bpp),
PPM (P6), PNG (8-bit, stdlib zlib inflate + scanline de-filtering) and
baseline JPEG (pure-numpy DCT + Huffman, T.81) are decoded / resized /
feature-extracted for real with pure numpy (functions/codecs.py — no
image/audio libraries needed), including a length-prefixed BMP frame
container for video whose frame sampling extracts real frame payloads. Only
formats whose codecs genuinely need a heavyweight library (mp3/h264/...)
remain stubbed: decode attempts a real backend
(PIL) via import-try and otherwise produces a **deterministic fake decode**
(feature bytes derived from the payload hash). Passing ``require_real=True``
raises ``NotImplementedError`` for exactly those formats, marking where a
deployment plugs in a codec.
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


def synthesize_real_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Media table whose payloads are REAL encoded files: BMP/PPM images,
    PCM16 WAV audio, and ``video/bmpseq`` (length-prefixed BMP frames).
    Deterministic at any parallelism: each row's content comes from a
    ``default_rng(seed, media_id)`` stream keyed by the row id, generated
    inside an Arrow-batched mapInPandas (no driver-side loop)."""
    import struct as _struct

    from . import codecs

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("media_id", "kind", "data", "format", "width", "height",
                     "sample_rate", "n_frames")}
            for mid in pdf["id"]:
                rng = np.random.default_rng((seed, int(mid)))
                pick = int(mid) % 3
                if pick == 0:          # image: BMP, PPM or PNG
                    w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
                    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    enc = [
                        (codecs.encode_bmp, "image/bmp"),
                        (codecs.encode_ppm, "image/ppm"),
                        (codecs.encode_png, "image/png"),
                        (codecs.encode_jpeg, "image/jpeg"),
                    ][(int(mid) // 3) % 4]
                    vals = ("image", enc[0](px), enc[1], w, h, None, None)
                elif pick == 1:        # audio: WAV
                    sr = 16_000
                    nsamp = int(rng.integers(400, 4000))
                    x = rng.standard_normal(nsamp).astype(np.float32) * 0.2
                    vals = ("audio", codecs.encode_wav(x, sr), "audio/wav",
                            None, None, sr, nsamp)
                else:                  # video: length-prefixed BMP frames
                    w, h = int(rng.integers(8, 24)), int(rng.integers(8, 24))
                    nf = int(rng.integers(2, 12))
                    frames = []
                    for _ in range(nf):
                        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                        b = codecs.encode_bmp(px)
                        frames.append(_struct.pack("<I", len(b)) + b)
                    vals = ("video", _struct.pack("<I", nf) + b"".join(frames),
                            "video/bmpseq", w, h, None, nf)
                kind, data, fmt, w_, h_, sr_, nf_ = vals
                rows["media_id"].append(int(mid))
                rows["kind"].append(kind)
                rows["data"].append(data)
                rows["format"].append(fmt)
                rows["width"].append(w_)
                rows["height"].append(h_)
                rows["sample_rate"].append(sr_)
                rows["n_frames"].append(nf_)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


_REAL_FORMATS = {
    "image/bmp", "image/ppm", "image/png", "image/jpeg", "audio/wav", "video/bmpseq",
}


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


def _decode_one(data: bytes, fmt: str):
    """payload → decoded object for the REAL formats, None otherwise."""
    from . import codecs

    if fmt == "audio/wav":
        return codecs.decode_wav(data)
    if fmt == "image/bmp":
        return codecs.decode_bmp(data)
    if fmt == "image/ppm":
        return codecs.decode_ppm(data)
    if fmt == "image/png":
        return codecs.decode_png(data)
    if fmt == "image/jpeg":
        return codecs.decode_jpeg(data)
    if fmt == "video/bmpseq":
        import struct as _struct

        nf = _struct.unpack_from("<I", data, 0)[0]
        # features come from the first frame; sampling handles the rest
        flen = _struct.unpack_from("<I", data, 4)[0]
        return nf, codecs.decode_bmp(data[8 : 8 + flen])
    return None


def _features_one(data: bytes | None, fmt: str) -> list | None:
    from . import codecs

    if data is None:
        return None
    dec = _decode_one(data, fmt) if fmt in _REAL_FORMATS else None
    if dec is None:
        return _fake_features(data).tolist()
    if fmt == "audio/wav":
        samples, rate = dec
        return codecs.audio_features(samples, rate, FEATURE_DIM).tolist()
    if fmt == "video/bmpseq":
        _nf, first = dec
        return codecs.image_features(first, FEATURE_DIM).tolist()
    return codecs.image_features(dec, FEATURE_DIM).tolist()


def extract_features(df: DataFrame, require_real: bool = False) -> DataFrame:
    """media → (media_id, kind, n_bytes, features[16]) via Arrow-batched
    mapInPandas. REAL decode for wav/bmp/ppm/png/jpeg/bmpseq payloads (pure
    numpy, functions/codecs.py); other formats are the stub boundary —
    ``require_real=True`` rejects them unless a real backend (PIL) exists."""
    backend = _real_image_backend()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if require_real and backend is None:
                bad = set(pdf["format"]) - _REAL_FORMATS
                if bad:
                    raise NotImplementedError(
                        f"no real codec for {sorted(bad)} (PIL not installed); "
                        "wav/bmp/ppm/png/jpeg/bmpseq decode for real, or run "
                        "with require_real=False (deterministic fake)"
                    )
            feats = [
                _features_one(d, f) for d, f in zip(pdf["data"], pdf["format"])
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
    """Image resize. bmp/ppm/png/jpeg payloads are REALLY resampled (nearest-
    neighbor, pure numpy) and re-encoded; other image formats keep their payload and
    only re-stamp geometry (the stub) — rejected under ``require_real``
    unless a real backend (PIL) exists."""
    backend = _real_image_backend()
    from . import codecs

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            mask = out["kind"] == "image"
            if require_real and backend is None:
                bad = set(out.loc[mask, "format"]) - _REAL_FORMATS
                if bad:
                    raise NotImplementedError(
                        f"no real resize for {sorted(bad)} (PIL not installed)"
                    )
            new_data = []
            for i in out.index:
                if not mask[i] or out.at[i, "data"] is None:
                    new_data.append(out.at[i, "data"])
                    continue
                fmt = out.at[i, "format"]
                if fmt == "image/bmp":
                    px = codecs.resize_nearest(codecs.decode_bmp(out.at[i, "data"]), width, height)
                    new_data.append(codecs.encode_bmp(px))
                elif fmt == "image/ppm":
                    px = codecs.resize_nearest(codecs.decode_ppm(out.at[i, "data"]), width, height)
                    new_data.append(codecs.encode_ppm(px))
                elif fmt == "image/png":
                    px = codecs.resize_nearest(codecs.decode_png(out.at[i, "data"]), width, height)
                    new_data.append(codecs.encode_png(px))
                elif fmt == "image/jpeg":
                    px = codecs.resize_nearest(codecs.decode_jpeg(out.at[i, "data"]), width, height)
                    new_data.append(codecs.encode_jpeg(px))
                else:
                    new_data.append(out.at[i, "data"])  # stub: payload unchanged
            out["data"] = new_data
            out.loc[mask, "width"] = np.int32(width)
            out.loc[mask, "height"] = np.int32(height)
            yield out

    return df.mapInPandas(fn, df.schema)


def sample_frames(df: DataFrame, every_n: int = 10, extract: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index, computed
    natively (explode over a sequence — no UDF for the index fan-out). With
    ``extract=True``, ``video/bmpseq`` payloads have the sampled frame's BMP
    bytes REALLY extracted (length-prefixed container walk in an
    Arrow-batched mapInPandas); other video formats return null frame_data
    (the codec stub)."""
    vids = df.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    out = vids.select(
        "media_id",
        F.col("format").alias("format"),
        F.explode(idx).alias("frame_idx"),
        F.col("data").alias("source_data"),
    )
    if not extract:
        return out.drop("format")

    import struct as _struct

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_data", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for data, fmt, fi in zip(pdf["source_data"], pdf["format"], pdf["frame_idx"]):
                if data is None or fmt != "video/bmpseq":
                    frames.append(None)
                    continue
                nf = _struct.unpack_from("<I", data, 0)[0]
                pos, frame = 4, None
                for k in range(min(nf, int(fi) + 1)):
                    flen = _struct.unpack_from("<I", data, pos)[0]
                    pos += 4
                    if k == int(fi):
                        frame = bytes(data[pos : pos + flen])
                        break
                    pos += flen
                frames.append(frame)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "frame_data": frames,
                }
            )

    return out.mapInPandas(fn, schema)
