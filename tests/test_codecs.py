"""Real pure-numpy codecs (functions/codecs.py) and their multimodal wiring:
WAV/BMP/PPM/PNG/JPEG round-trips, nearest-neighbor resize, feature extraction
on real decoded content, and real frame extraction from the bmpseq video
container. Only formats needing heavyweight libraries (mp3/h264/...) remain
behind the declared stub boundary."""

from __future__ import annotations

import numpy as np
import pytest

from openmrs_module_epts_etl_spark.functions import codecs
from openmrs_module_epts_etl_spark.functions.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_real_media,
)

# ------------------------------------------------------------ pure numpy


def test_wav_roundtrip_and_stereo_downmix():
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(1234) * 0.3).clip(-1, 1).astype(np.float32)
    payload = codecs.encode_wav(x, 22_050)
    y, rate = codecs.decode_wav(payload)
    assert rate == 22_050 and len(y) == 1234
    np.testing.assert_allclose(y, x, atol=1 / 32000)

    # hand-build a stereo payload: interleave L/R, decode averages to mono
    import struct

    stereo = np.empty(200, dtype="<i2")
    stereo[0::2] = 1000
    stereo[1::2] = 3000
    data = stereo.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 2, 8000, 8000 * 4, 4, 16, b"data", len(data),
    )
    y2, r2 = codecs.decode_wav(hdr + data)
    assert r2 == 8000 and len(y2) == 100
    np.testing.assert_allclose(y2, np.full(100, 2000 / 32767.0, np.float32), atol=1e-6)

    with pytest.raises(ValueError):
        codecs.decode_wav(b"nonsense-bytes-here-not-riff-wave-data")


@pytest.mark.parametrize("w,h", [(5, 3), (8, 8), (17, 4)])  # odd widths hit row padding
def test_bmp_roundtrip(w, h):
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = codecs.decode_bmp(codecs.encode_bmp(px))
    np.testing.assert_array_equal(out, px)


def test_ppm_roundtrip_and_comment_header():
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    np.testing.assert_array_equal(codecs.decode_ppm(codecs.encode_ppm(px)), px)
    # PPM headers may carry comments
    body = px.tobytes()
    with_comment = b"P6\n# a comment\n6 4\n255\n" + body
    np.testing.assert_array_equal(codecs.decode_ppm(with_comment), px)


def test_resize_nearest_geometry_and_identity():
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = codecs.resize_nearest(px, 4, 2)
    assert out.shape == (2, 4, 3)
    np.testing.assert_array_equal(codecs.resize_nearest(px, 8, 8), px)


def test_feature_vectors_shape_and_determinism():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    f1 = codecs.image_features(px, FEATURE_DIM)
    assert f1.shape == (FEATURE_DIM,) and f1.dtype == np.float32
    np.testing.assert_array_equal(f1, codecs.image_features(px, FEATURE_DIM))
    x = rng.standard_normal(500).astype(np.float32) * 0.2
    a1 = codecs.audio_features(x, 16_000, FEATURE_DIM)
    assert a1.shape == (FEATURE_DIM,)
    assert a1[0] == pytest.approx(500 / 16_000)


# --------------------------------------------------------------------- PNG


def test_png_roundtrip_every_filter_type():
    """Encode with each of the five PNG scanline filters (0..4) — round-trip
    exercises every de-filter branch (None, Sub-cumsum, Up, Average, Paeth)."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    for f in range(5):
        payload = codecs.encode_png(px, filter_type=f)
        assert payload.startswith(b"\x89PNG")
        np.testing.assert_array_equal(codecs.decode_png(payload), px, err_msg=f"filter {f}")


def test_png_gray_and_rgba_decode():
    """Color types 0 (gray → stacked) and 6 (RGBA → alpha dropped), built by
    hand so the decoder is tested against the spec, not our own encoder."""
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # 2x3 gray ramp, filter 0 rows
    gray = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    body = b"".join(b"\x00" + row.tobytes() for row in gray)
    png = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )
    out = codecs.decode_png(png)
    assert out.shape == (2, 3, 3)
    np.testing.assert_array_equal(out[:, :, 0], gray)
    np.testing.assert_array_equal(out[:, :, 1], gray)

    rgba = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
    body = b"".join(b"\x00" + row.tobytes() for row in rgba)
    png = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode_png(png), rgba[:, :, :3])


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_png(b"not-a-png-at-all-really")
    # interlaced flag set → explicit unsupported error, not silent garbage
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlace"):
        codecs.decode_png(png)


# ------------------------------------------------------------------- JPEG


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 3 + xx * 2) % 256, (xx * 4) % 256, (yy * 5) % 256],
                    axis=-1).astype(np.uint8)


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("restart_interval", [0, 3])
def test_jpeg_roundtrip_smooth(subsampling, restart_interval):
    # 37x53: exercises MCU padding on both axes for 8- and 16-px MCUs
    px = _gradient(37, 53)
    payload = codecs.encode_jpeg(
        px, quality=95, subsampling=subsampling, restart_interval=restart_interval
    )
    out = codecs.decode_jpeg(payload)
    assert out.shape == px.shape
    err = np.abs(out.astype(int) - px.astype(int)).mean()
    assert err < (2.0 if subsampling == "444" else 4.0), err


def test_jpeg_flat_color_is_near_exact():
    px = np.full((16, 24, 3), 130, np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=75))
    assert np.abs(out.astype(int) - 130).max() <= 1


def test_jpeg_grayscale_single_component():
    g = (np.arange(29 * 41).reshape(29, 41) % 251).astype(np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(g, quality=95))
    assert out.shape == (29, 41, 3)
    assert (out[:, :, 0] == out[:, :, 1]).all() and (out[:, :, 0] == out[:, :, 2]).all()
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean() < 2.0


def test_jpeg_quality_monotonic_size():
    px = _gradient(32, 32)
    sizes = [len(codecs.encode_jpeg(px, quality=q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)


def test_jpeg_rejects_garbage_and_progressive():
    with pytest.raises(ValueError, match="SOI"):
        codecs.decode_jpeg(b"definitely-not-a-jpeg-payload")
    good = bytearray(codecs.encode_jpeg(_gradient(8, 8)))
    sof = good.find(b"\xff\xc0")
    good[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF2"):
        codecs.decode_jpeg(bytes(good))


def test_jpeg_byte_stuffing_survives():
    # saturated blocks force 0xFF bytes into the entropy stream
    rng = np.random.default_rng(3)
    px = (rng.integers(0, 2, (24, 24, 3)) * 255).astype(np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=100))
    assert out.shape == px.shape


# ------------------------------------------------------------ spark wiring

_DECODERS = {
    "image/bmp": codecs.decode_bmp,
    "image/ppm": codecs.decode_ppm,
    "image/png": codecs.decode_png,
    "image/jpeg": codecs.decode_jpeg,
}


@pytest.fixture(scope="module")
def real_media(spark):
    df = synthesize_real_media(spark, 30).persist()
    df.count()
    yield df
    df.unpersist()


def test_synthesize_real_media_payloads_decode(real_media):
    rows = real_media.collect()
    assert {r["kind"] for r in rows} == {"image", "audio", "video"}
    for r in rows:
        if r["format"] == "image/bmp":
            px = codecs.decode_bmp(bytes(r["data"]))
            assert px.shape == (r["height"], r["width"], 3)
        elif r["format"] == "image/ppm":
            px = codecs.decode_ppm(bytes(r["data"]))
            assert px.shape == (r["height"], r["width"], 3)
        elif r["format"] == "image/png":
            px = codecs.decode_png(bytes(r["data"]))
            assert px.shape == (r["height"], r["width"], 3)
        elif r["format"] == "image/jpeg":
            px = codecs.decode_jpeg(bytes(r["data"]))
            assert px.shape == (r["height"], r["width"], 3)
        elif r["format"] == "audio/wav":
            x, rate = codecs.decode_wav(bytes(r["data"]))
            assert rate == r["sample_rate"] and len(x) == r["n_frames"]
    # deterministic regeneration at different parallelism
    again = synthesize_real_media(real_media.sparkSession, 30).repartition(7)
    a = {r["media_id"]: bytes(r["data"]) for r in real_media.collect()}
    b = {r["media_id"]: bytes(r["data"]) for r in again.collect()}
    assert a == b


def test_extract_features_real_path_matches_direct_codec(real_media):
    out = {r["media_id"]: r for r in extract_features(real_media, require_real=True).collect()}
    for r in real_media.collect():
        feats = np.array(out[r["media_id"]]["features"], np.float32)
        assert len(feats) == FEATURE_DIM
        if r["format"] == "audio/wav":
            x, rate = codecs.decode_wav(bytes(r["data"]))
            np.testing.assert_allclose(feats, codecs.audio_features(x, rate), atol=1e-6)
        elif r["format"] == "image/bmp":
            px = codecs.decode_bmp(bytes(r["data"]))
            np.testing.assert_allclose(feats, codecs.image_features(px), atol=1e-6)


def test_resize_images_really_resamples(real_media):
    out = resize_images(real_media, 16, 12, require_real=True)
    for r in out.filter("kind = 'image'").collect():
        assert r["width"] == 16 and r["height"] == 12
        dec = _DECODERS[r["format"]](bytes(r["data"]))
        assert dec.shape == (12, 16, 3)  # payload itself changed, not just metadata


def test_sample_frames_extracts_real_bmp_frames(real_media):
    rows = sample_frames(real_media, every_n=3, extract=True).collect()
    assert rows
    vids = {r["media_id"]: r for r in real_media.filter("kind = 'video'").collect()}
    for r in rows:
        v = vids[r["media_id"]]
        px = codecs.decode_bmp(bytes(r["frame_data"]))
        assert px.shape == (v["height"], v["width"], 3)
        assert r["frame_idx"] % 3 == 0


# ------------------------------------------------------- property-based

from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


@settings(max_examples=50, deadline=None)
@given(
    arrays(np.uint8, st.tuples(st.integers(1, 20), st.integers(1, 20), st.just(3)))
)
def test_bmp_roundtrip_property(px):
    np.testing.assert_array_equal(codecs.decode_bmp(codecs.encode_bmp(px)), px)


@settings(max_examples=50, deadline=None)
@given(
    arrays(np.uint8, st.tuples(st.integers(1, 20), st.integers(1, 20), st.just(3)))
)
def test_ppm_roundtrip_property(px):
    np.testing.assert_array_equal(codecs.decode_ppm(codecs.encode_ppm(px)), px)


@settings(max_examples=30, deadline=None)
@given(
    arrays(np.uint8, st.tuples(st.integers(1, 16), st.integers(1, 16), st.just(3))),
    st.integers(0, 4),
)
def test_png_roundtrip_property(px, filter_type):
    np.testing.assert_array_equal(
        codecs.decode_png(codecs.encode_png(px, filter_type=filter_type)), px
    )


@settings(max_examples=50, deadline=None)
@given(
    arrays(np.int16, st.integers(1, 2000)),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    y, r = codecs.decode_wav(codecs.encode_wav(samples, rate))
    assert r == rate and len(y) == len(samples)
    np.testing.assert_allclose(y, samples.astype(np.float32) / 32767.0, atol=1e-6)


@settings(max_examples=30, deadline=None)
@given(
    arrays(np.uint8, st.tuples(st.integers(1, 16), st.integers(1, 16), st.just(3))),
    st.integers(1, 24),
    st.integers(1, 24),
)
def test_resize_property_shape_and_value_membership(px, w, h):
    out = codecs.resize_nearest(px, w, h)
    assert out.shape == (h, w, 3)
    # nearest-neighbor only selects existing pixels
    src = {tuple(p) for p in px.reshape(-1, 3)}
    assert all(tuple(p) in src for p in out.reshape(-1, 3))


@settings(max_examples=20, deadline=None)
@given(
    arrays(np.uint8, st.tuples(st.integers(1, 16), st.integers(1, 16), st.just(3))),
    st.sampled_from(["444", "420"]),
)
def test_jpeg_decodes_whatever_encoder_emits(px, subsampling):
    # lossy: assert structure, not values — exactness covered by the smooth
    # and flat-color tests above
    out = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=95, subsampling=subsampling))
    assert out.shape == px.shape and out.dtype == np.uint8
