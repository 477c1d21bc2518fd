"""Real pure-numpy codecs for uncompressed media formats.

The container has no PIL/soundfile, but uncompressed formats need none:
WAV (RIFF/PCM16), BMP (BITMAPINFOHEADER, 24bpp bottom-up), and PPM (P6) are
fixed headers over raw sample/pixel arrays — ``struct`` + numpy decode them
exactly. multimodal.py routes these formats through here (REAL decode /
resize / feature extraction); only compressed formats (jpeg/png/mp3/...)
remain behind the declared stub boundary.

Everything is array-in/bytes-out (and vice versa): no per-row Python at the
Spark layer — these run inside Arrow-batched ``mapInPandas`` over the binary
column, one numpy call chain per row payload.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Mono PCM16 WAV. ``samples`` is float in [-1, 1] or int16."""
    if samples.dtype != np.int16:
        samples = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
        samples = (samples * 32767.0).astype("<i2")
    else:
        samples = samples.astype("<i2", copy=False)
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """→ (float32 samples in [-1, 1], sample_rate). PCM16 mono/stereo; stereo
    is averaged to mono. Raises ValueError on anything else."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    while pos + 8 <= n:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _bps, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload, pos
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding (fmt={audio_fmt}, bits={bits})")
            fmt = (channels, rate)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            channels, rate = fmt
            raw = np.frombuffer(payload, dtype="<i2", count=(size // 2), offset=pos)
            x = raw.astype(np.float32) / 32767.0
            if channels > 1:
                x = x[: (len(x) // channels) * channels].reshape(-1, channels).mean(axis=1)
            return x, rate
        pos += size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV has no data chunk")


# --------------------------------------------------------------------- BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24bpp uncompressed BMP from an (H, W, 3) uint8 RGB array."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("need (H, W, 3) RGB")
    row = w * 3
    pad = (-row) % 4
    # BMP stores BGR, bottom-up, rows padded to 4 bytes
    bgr = pixels[::-1, :, ::-1].astype(np.uint8)
    if pad:
        bgr = np.concatenate([bgr.reshape(h, row), np.zeros((h, pad), np.uint8)], axis=1)
    body = bgr.tobytes()
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + info + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """→ (H, W, 3) uint8 RGB. 24bpp uncompressed BITMAPINFOHEADER only."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    hsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hsz < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flipped = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    img = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return img[::-1] if flipped else img


# --------------------------------------------------------------------- PPM


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("need (H, W, 3) RGB")
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3)


# ----------------------------------------------------------- transformations


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample — pure index arithmetic, deterministic."""
    h, w = pixels.shape[:2]
    yi = (np.arange(height) * (h / height)).astype(np.intp)
    xi = (np.arange(width) * (w / width)).astype(np.intp)
    return pixels[yi][:, xi]


def image_features(pixels: np.ndarray, dim: int = 16) -> np.ndarray:
    """[h, w, mean RGB (3), std RGB (3), 8-bin luma histogram] → dim floats."""
    h, w = pixels.shape[:2]
    px = pixels.reshape(-1, 3).astype(np.float32)
    luma = px @ np.array([0.299, 0.587, 0.114], np.float32)
    hist = np.histogram(luma, bins=8, range=(0.0, 256.0))[0]
    hist = hist.astype(np.float32) / max(len(luma), 1)
    out = np.concatenate(
        [
            np.array([h, w], np.float32) / 512.0,
            px.mean(axis=0) / 255.0,
            px.std(axis=0) / 255.0,
            hist,
        ]
    )
    return np.resize(out, dim).astype(np.float32)


def audio_features(samples: np.ndarray, sample_rate: int, dim: int = 16) -> np.ndarray:
    """[duration, rms, mean, std, zero-crossing rate, 11-bin |x| histogram]."""
    x = samples.astype(np.float32)
    n = max(len(x), 1)
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / n
    hist = np.histogram(np.abs(x), bins=11, range=(0.0, 1.0))[0].astype(np.float32) / n
    out = np.concatenate(
        [
            np.array(
                [len(x) / max(sample_rate, 1), float(np.sqrt((x * x).mean() if len(x) else 0.0)),
                 float(x.mean() if len(x) else 0.0), float(x.std() if len(x) else 0.0), zc],
                np.float32,
            ),
            hist,
        ]
    )
    return np.resize(out, dim).astype(np.float32)
