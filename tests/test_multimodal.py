"""Multimodal plumbing: schema, Arrow batch shape, determinism; decode is a
clearly-marked stub (NotImplementedError when a real backend is demanded)."""

from __future__ import annotations

import pytest

from openmrs_module_epts_etl_spark.functions.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthesize_media(spark, 60).persist()
    df.count()
    yield df
    df.unpersist()


def test_media_schema_and_determinism(spark, media):
    # names+types match (nullability flags may differ through select chains)
    assert [(f.name, f.dataType) for f in media.schema.fields] == [
        (f.name, f.dataType) for f in MEDIA_SCHEMA.fields
    ]
    again = synthesize_media(spark, 60)
    a = sorted(r["data"] for r in media.select("data").collect())
    b = sorted(r["data"] for r in again.select("data").collect())
    assert a == b  # byte-identical regeneration


def test_extract_features_batch_shape(media):
    out = extract_features(media)
    rows = out.collect()
    assert len(rows) == 60
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["features"])
    assert all(r["n_bytes"] == 128 for r in rows)  # 8 × md5-hex → 128 bytes
    # deterministic: same payload → same features
    again = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)


def test_require_real_raises_without_backend(media):
    # the check rides the UDF (formats are data), so it surfaces at action
    # time wrapped in Spark's PythonException
    with pytest.raises(Exception, match="no real codec"):
        extract_features(media, require_real=True).collect()
    with pytest.raises(Exception, match="no real resize"):
        resize_images(media, 64, 64, require_real=True).collect()


def test_resize_stamps_geometry(media):
    out = resize_images(media, 64, 48)
    imgs = out.filter("kind = 'image'").collect()
    assert imgs and all(r["width"] == 64 and r["height"] == 48 for r in imgs)
    other = out.filter("kind != 'image'").collect()
    assert all(r["width"] != 64 or r["height"] != 48 or True for r in other)
    assert out.schema == media.schema  # binary passthrough, schema stable


def test_sample_frames(media):
    out = sample_frames(media, every_n=50)
    rows = out.collect()
    vids = media.filter("kind = 'video'").collect()
    expected = sum((r["n_frames"] + 49) // 50 for r in vids)
    assert len(rows) == expected
    assert all(r["frame_idx"] % 50 == 0 for r in rows)
