"""Real pure-numpy codecs for media formats that need no external library.

The container has no PIL/soundfile, but these formats need none:
WAV (RIFF/PCM16), BMP (BITMAPINFOHEADER, 24bpp bottom-up), and PPM (P6) are
fixed headers over raw sample/pixel arrays — ``struct`` + numpy decode them
exactly — PNG (8-bit gray/RGB/RGBA, non-interlaced) is stdlib ``zlib``
plus chunk framing and scanline (de)filtering, and baseline JPEG is DCT +
Huffman implemented below from the public T.81 spec.
multimodal.py routes these formats through here (REAL decode / resize /
feature extraction); only formats whose codecs genuinely need a heavyweight
library (mp3/h264/...) remain behind the declared stub boundary.

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
            # final mod is equivalent. Pure-int Python recurrence: numpy
            # scalar ufuncs per byte cost ~µs each, and libpng-produced
            # files are mostly Average/Paeth rows — this loop IS the decode
            # hot path, so it stays in plain ints (all operands ≥ 0 here,
            # so (a+b)>>1 and &255 are exact).
            cur_l = cur.tolist()
            prev_l = prev.tolist()
            row_l = [0] * stride
            if f == 3:
                for x in range(stride):
                    a = row_l[x - bpp] if x >= bpp else 0
                    row_l[x] = (cur_l[x] + ((a + prev_l[x]) >> 1)) & 255
            else:
                for x in range(stride):
                    a = row_l[x - bpp] if x >= bpp else 0
                    b = prev_l[x]
                    c = prev_l[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row_l[x] = (cur_l[x] + pred) & 255
            row = np.asarray(row_l, np.int32)
        else:
            raise ValueError(f"bad PNG filter type {f} on line {y}")
        prev = row % 256
        recon[y] = prev
    img = recon.astype(np.uint8).reshape(h, w, channels)
    if channels == 1:
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3]


# -------------------------------------------------------------------- JPEG
#
# Baseline-sequential JPEG (ITU-T T.81), pure numpy + stdlib — the last
# compressed-image boundary with no optional dependency. The DECODER is
# general for the baseline profile: it reads quantization and Huffman tables
# from the stream (DQT/DHT), supports SOF0/SOF1 frames with arbitrary
# per-component sampling factors (4:4:4, 4:2:0, 4:2:2, ...), grayscale or
# YCbCr, byte stuffing and DRI/RSTn restart intervals. Progressive (SOF2),
# arithmetic coding and 12-bit precision are rejected with a clear error.
# The ENCODER emits 4:4:4 or 4:2:0 with the spec's Annex-K quantization
# tables (quality-scaled, libjpeg formula) and simple fixed-length canonical
# Huffman tables declared in DHT — spec-valid output any baseline decoder
# reads, chosen for obvious correctness over optimal compression (this codec
# exists for the multimodal pipeline's test path, not archival storage).

_ZIGZAG = np.array(
    sorted(
        range(64),
        key=lambda k: (
            k // 8 + k % 8,
            (k // 8) if (k // 8 + k % 8) % 2 else -(k // 8),
        ),
    ),
    dtype=np.intp,
)  # _ZIGZAG[seq] = raster index; starts 0, 1, 8, 16, 9, 2, ...

_JPEG_QLUM = np.array([  # T.81 Annex K.1, luminance
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_JPEG_QCHROM = np.array([  # T.81 Annex K.2, chrominance
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _jpeg_dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos((2 * n + 1) * k * np.pi / 16.0)
    c[0] *= np.sqrt(0.5)
    return (c * 0.5).astype(np.float64)  # orthonormal: X = C.T @ (C @ X @ C.T) @ C


_DCT_M = _jpeg_dct_matrix()

# Encoder Huffman alphabets (canonical fixed-length: DC categories 0..11 at
# 4 bits, the 162 AC symbols at 8 bits — prefix-free, all-ones code unused
# as T.81 requires). The decoder never assumes these: it builds whatever
# canonical tables the stream's DHT declares.
_ENC_DC_SYMS = list(range(12))
_ENC_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canonical_codes(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (BITS, HUFFVAL) → {symbol: (code, length)} per T.81 Annex C."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[syms[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_ENC_DC = _canonical_codes(_ENC_DC_BITS, _ENC_DC_SYMS)
_ENC_AC = _canonical_codes(_ENC_AC_BITS, _ENC_AC_SYMS)


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)

    def align(self) -> None:  # pad with 1-bits to a byte boundary (T.81 F.1.2.3)
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """MSB-first bit reader over stuffing-stripped entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte_i, bit_i = divmod(self.pos, 8)
        if byte_i >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        self.pos += 1
        return (self.data[byte_i] >> (7 - bit_i)) & 1

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """v → (category, code bits) per T.81 F.1.2.1 (negative: ones' complement)."""
    cat = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    return cat, (v if v >= 0 else v + (1 << cat) - 1)


def _extend(v: int, cat: int) -> int:
    return v if cat == 0 or v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _plane_to_blocks(plane: np.ndarray, bx: int, by: int) -> np.ndarray:
    """Pad a float plane (edge replication) to (by*8, bx*8) and return
    quantizable (by*bx, 8, 8) DCT input blocks (level-shifted)."""
    h, w = plane.shape
    plane = np.pad(plane, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return np.einsum("ab,nbc,dc->nad", _DCT_M, blocks - 128.0, _DCT_M)


def _encode_block(bw: _BitWriter, zz: np.ndarray, dc_pred: int) -> int:
    dc = int(zz[0])
    cat, bits = _magnitude(dc - dc_pred)
    code, length = _ENC_DC[cat]
    bw.write(code, length)
    if cat:
        bw.write(bits, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _ENC_AC[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        cat, bits = _magnitude(v)
        c, ln = _ENC_AC[(run << 4) | cat]
        bw.write(c, ln)
        bw.write(bits, cat)
        run = 0
    if last_nz < 63:
        c, ln = _ENC_AC[0x00]  # EOB
        bw.write(c, ln)
    return dc


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG from an (H, W, 3) uint8 RGB array, or an (H, W) uint8
    array (single-component grayscale). ``subsampling`` is ``"444"`` or
    ``"420"``; ``restart_interval`` > 0 emits DRI + RSTn markers every that
    many MCUs (exercises decoder resync)."""
    gray = pixels.ndim == 2
    if gray:
        h, w = pixels.shape
    else:
        h, w, c = pixels.shape
        if c != 3:
            raise ValueError("need (H, W, 3) RGB or (H, W) gray")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qlum = np.clip((_JPEG_QLUM * scale + 50) // 100, 1, 255)
    qchrom = np.clip((_JPEG_QCHROM * scale + 50) // 100, 1, 255)

    if gray:
        samp = [(1, 1)]
    elif subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    ycc = pixels.astype(np.float64)[..., None] if gray else _rgb_to_ycbcr(pixels)
    comp_blocks = []  # per comp: (coef blocks in zigzag, bx)
    for ci, (hi, vi) in enumerate(samp):
        plane = ycc[..., ci]
        if (hi, vi) != (hmax, vmax):  # chroma downsample by box mean
            fy, fx = vmax // vi, hmax // hi
            ph = np.pad(plane, ((0, (-h) % fy), (0, (-w) % fx)), mode="edge")
            plane = ph.reshape(ph.shape[0] // fy, fy, ph.shape[1] // fx, fx).mean(axis=(1, 3))
        bx, by = mcux * hi, mcuy * vi
        coefs = _plane_to_blocks(plane, bx, by)
        q = (qlum if ci == 0 else qchrom).reshape(8, 8).astype(np.float64)
        quant = np.round(coefs / q).astype(np.int64)
        # _ZIGZAG[seq] = raster index, so column-indexing raster-order rows
        # by _ZIGZAG yields the zigzag-sequence coefficients
        comp_blocks.append((quant.reshape(-1, 64)[:, _ZIGZAG], bx))

    bw = _BitWriter()
    preds = [0] * len(samp)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.align()
            bw.buf += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * len(samp)
        my, mx = divmod(m, mcux)
        for ci, (hi, vi) in enumerate(samp):
            blocks, bx = comp_blocks[ci]
            bpr = bx  # blocks per row in this component plane
            for v in range(vi):
                for hh in range(hi):
                    bi = (my * vi + v) * bpr + (mx * hi + hh)
                    preds[ci] = _encode_block(bw, blocks[bi], preds[ci])
    bw.align()

    nc = len(samp)
    dqt_body = b"\x00" + bytes(qlum[_ZIGZAG].astype(np.uint8))
    if nc > 1:
        dqt_body += b"\x01" + bytes(qchrom[_ZIGZAG].astype(np.uint8))
    dqt = _jpeg_seg(0xDB, dqt_body)
    sof_comps = b"".join(
        struct.pack(">BBB", ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1)
        for ci in range(nc)
    )
    sof0 = _jpeg_seg(0xC0, struct.pack(">BHHB", 8, h, w, nc) + sof_comps)
    dht = _jpeg_seg(
        0xC4,
        b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_SYMS)
        + b"\x10" + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_SYMS),
    )
    dri = _jpeg_seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = _jpeg_seg(
        0xDA,
        bytes([nc]) + b"".join(struct.pack(">BB", ci + 1, 0x00) for ci in range(nc))
        + b"\x00\x3f\x00",
    )
    return (
        b"\xff\xd8"  # SOI
        + _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt + sof0 + dht + dri + sos
        + bytes(bw.buf)
        + b"\xff\xd9"  # EOI
    )


def _split_entropy(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``pos``: strip 0xFF00 stuffing, split at RSTn.
    Returns (segments, position of the terminating marker's 0xFF)."""
    segs, cur = [], bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = payload[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """→ (H, W, 3) uint8 RGB. Baseline/extended-sequential Huffman JPEG
    (SOF0/SOF1): tables from the stream, any sampling factors, grayscale
    (stacked to 3 channels) or YCbCr, DRI/RSTn restarts."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before the
        # marker code — treating a fill byte as the code would misread the
        # next real marker byte as a segment length
        while pos + 2 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT: possibly several tables per segment
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tab = np.zeros(64, np.int64)
                tab[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, i + 1)
                qtabs[tq] = tab
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nsym = sum(bits)
                syms = list(body[i + 17 : i + 17 + nsym])
                # decode map: (length, code) → symbol
                enc = _canonical_codes(bits, syms)
                htabs[(cls, tid)] = {(ln, code): s for s, (code, ln) in enc.items()}
                i += 17 + nsym
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, *range(0xC5, 0xC8), *range(0xC9, 0xCC), 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0} (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS → entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            segs, pos = _split_entropy(payload, pos)
            return _jpeg_decode_scan(frame, scan, qtabs, htabs, restart_interval, segs)
        # APPn / COM / anything else: skipped
    raise ValueError("JPEG has no SOS scan")


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_decode_scan(frame, scan, qtabs, htabs, restart_interval, segs) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = [
        np.zeros((mcuy * c["v"] * mcux * c["h"], 64), np.int64) for c, _, _ in scan
    ]
    preds = [0] * len(scan)
    seg_i = 0
    br = _BitReader(segs[0])
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            br = _BitReader(segs[seg_i])
            preds = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for si, (comp, td, ta) in enumerate(scan):
            dct = htabs.get((0, td))
            act = htabs.get((1, ta))
            if dct is None or act is None:
                raise ValueError("JPEG scan references undefined Huffman table")
            for v in range(comp["v"]):
                for hh in range(comp["h"]):
                    zz = np.zeros(64, np.int64)
                    cat = _huff_decode(br, dct)
                    diff = _extend(br.read(cat), cat) if cat else 0
                    preds[si] += diff
                    zz[0] = preds[si]
                    k = 1
                    while k < 64:
                        sym = _huff_decode(br, act)
                        if sym == 0x00:  # EOB
                            break
                        run, size = sym >> 4, sym & 0xF
                        if size == 0:
                            if run != 15:
                                raise ValueError(f"bad JPEG AC symbol {sym:#x}")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC run past end of block")
                        zz[k] = _extend(br.read(size), size)
                        k += 1
                    bi = (my * comp["v"] + v) * (mcux * comp["h"]) + (mx * comp["h"] + hh)
                    coefs[si][bi] = zz
    planes = []
    for si, (comp, _, _) in enumerate(scan):
        q = qtabs.get(comp["tq"])
        if q is None:
            raise ValueError("JPEG component references undefined quant table")
        raster = np.zeros((len(coefs[si]), 64), np.float64)
        raster[:, _ZIGZAG] = coefs[si] * q[_ZIGZAG]
        blocks = np.einsum(
            "ba,nbc,cd->nad", _DCT_M, raster.reshape(-1, 8, 8), _DCT_M
        ) + 128.0
        bx, by = mcux * comp["h"], mcuy * comp["v"]
        plane = (
            blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        # crop to the component's true extent, then expand to full size with
        # index maps (out[y,x] = plane[y·v÷vmax, x·h÷hmax]) — exact for ANY
        # spec-legal sampling factors, including ones that don't divide
        # hmax/vmax (e.g. 3:2), where integer np.repeat factors would build
        # wrong-sized planes
        cw = -(-w * comp["h"] // hmax)
        ch = -(-h * comp["v"] // vmax)
        plane = plane[:ch, :cw]
        yi = np.arange(h) * comp["v"] // vmax
        xi = np.arange(w) * comp["h"] // hmax
        planes.append(plane[yi][:, xi])
    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


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
