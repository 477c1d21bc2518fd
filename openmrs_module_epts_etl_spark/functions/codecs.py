"""Real pure-numpy codecs for media formats that need no external library.

The container has no PIL/soundfile, but these formats need none:
WAV (RIFF/PCM16), BMP (BITMAPINFOHEADER, 24bpp bottom-up), and PPM (P6) are
fixed headers over raw sample/pixel arrays — ``struct`` + numpy decode them
exactly — and PNG (8-bit gray/RGB/RGBA, non-interlaced) is stdlib ``zlib``
plus chunk framing and scanline (de)filtering, implemented below.
multimodal.py routes these formats through here (REAL decode / resize /
feature extraction); only formats whose codecs genuinely need a heavyweight
library (jpeg/mp3/h264/...) remain behind the declared stub boundary.

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


# --------------------------------------------------------------------- PNG
#
# Minimal-but-real PNG: zlib is stdlib, the rest is chunk framing + scanline
# (de)filtering — so the COMPRESSED-image boundary needs no optional
# dependency. Supported: 8-bit depth, color types 0 (gray), 2 (RGB) and
# 6 (RGBA), no interlace, no palette. The encoder emits color type 2 and can
# apply any of the five scanline filters (encoding is fully vectorized —
# filtering references raw neighbor values, which are all known up front);
# the decoder handles all five (Sub via per-lane cumsum, Up vectorized,
# Average/Paeth as the spec's sequential recurrences).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit RGB (color type 2) PNG from an (H, W, 3) uint8 array.
    ``filter_type`` ∈ 0..4 is applied to every scanline (0 = None is the
    fast path; the others exist so round-trip tests exercise every
    de-filter branch)."""
    import zlib

    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("need (H, W, 3) RGB")
    if filter_type not in range(5):
        raise ValueError(f"bad PNG filter type {filter_type}")
    raw = pixels.astype(np.int16)  # headroom for the mod-256 filter math
    left = np.zeros_like(raw)
    left[:, 1:] = raw[:, :-1]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, 1:] = raw[:-1, :-1]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:  # Sub
        filt = raw - left
    elif filter_type == 2:  # Up
        filt = raw - up
    elif filter_type == 3:  # Average
        filt = raw - (left + up) // 2
    else:  # Paeth
        filt = raw - _paeth_predictor(left, up, upleft)
    lines = (filt % 256).astype(np.uint8).reshape(h, w * 3)
    body = np.concatenate(
        [np.full((h, 1), filter_type, np.uint8), lines], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(body))
        + _png_chunk(b"IEND", b"")
    )


def _paeth_predictor(a, b, c):
    """The PNG Paeth predictor, elementwise (spec §9, Filtering)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes) -> np.ndarray:
    """→ (H, W, 3) uint8 RGB. 8-bit gray/RGB/RGBA, non-interlaced (gray is
    stacked to 3 channels, RGBA drops alpha)."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, n = len(_PNG_SIG), len(payload)
    w = h = None
    channels = 0
    idat = b""
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, interlace={interlace})"
                )
            channels = {0: 1, 2: 3, 6: 4}.get(ctype, 0)
            if not channels:
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    raw = raw.reshape(h, stride + 1)
    ftypes, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    bpp = channels
    recon = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f, cur = int(ftypes[y]), lines[y]
        if f == 0:
            row = cur
        elif f == 1:  # Sub: per-lane cumsum (mod 256)
            row = cur.reshape(-1, bpp).cumsum(axis=0).reshape(-1)
        elif f == 2:  # Up
            row = cur + prev
        elif f in (3, 4):  # Average / Paeth: sequential in x by definition
            # mod 256 at EVERY reconstructed byte — these predictors are
            # nonlinear (floor div / min-select), unlike Sub/Up where one
            # final mod is equivalent
            row = np.zeros(stride, np.int32)
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 3:
                    row[x] = (cur[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    row[x] = (cur[x] + _paeth_predictor(a, b, c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {f} on line {y}")
        prev = row % 256
        recon[y] = prev
    img = recon.astype(np.uint8).reshape(h, w, channels)
    if channels == 1:
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3]


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
