"""Regression tests for the round-3 self-review findings: sliced-fence
namespace keyed by window width, empty sliced micro-batches keeping the
compaction cadence, JPEG fill bytes before markers, non-splittable files in
the scan-split estimate, and empty legacy batches without a rows key."""

from __future__ import annotations

import glob
import gzip
import os
import shutil

import numpy as np
import pyspark.sql.functions as F  # noqa: F401  (parity with sibling test modules)

from openmrs_module_epts_etl_spark.cdc.schemas import event_schema, transcript_schema
from openmrs_module_epts_etl_spark.functions import codecs
from openmrs_module_epts_etl_spark.functions.dedup import _scan_splits
from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, days
from openmrs_module_epts_etl_spark.sources.files import transport_batches

from test_cdc_pipeline import assert_state_matches
from test_streaming import _runner, feed_dir  # noqa: F401


def test_trigger_cap_change_does_not_drop_events(spark, tmp_path, feed_dir):
    """Changing max_offsets_per_trigger between (re)plays of the same
    checkpoint must never fence out never-applied lsn windows: slice ids are
    deterministic per (epoch, index), so a replay re-sliced under a DIFFERENT
    width computes different windows for the same ids — the fence namespace
    therefore carries the width (fence_key + f"-sliced-{{w}}"). Phase 1
    applies part of the feed at w=300; phase 2 replays from a wiped
    checkpoint over the FULL feed at w=500: with a shared namespace the
    phase-1 ids would swallow whole phase-2 windows of unseen events."""
    files = sorted(glob.glob(os.path.join(feed_dir, "**", "*.parquet"), recursive=True))
    assert len(files) >= 4
    stage = str(tmp_path / "stagedfeed")
    os.makedirs(stage)
    for i, f in enumerate(files[:2]):
        shutil.copy(f, os.path.join(stage, f"f{i:04d}.parquet"))

    t = LakeTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), [days("ts"), bucket(8, "conv_id")]
    )
    ck = str(tmp_path / "ck")
    r1 = _runner(spark, stage, t.path, ck)
    r1.max_files_per_trigger = 100
    r1.max_offsets_per_trigger = 300
    out1 = r1.run_available_now()
    assert len(out1) >= 3  # epoch 0 really was sliced under w=300

    # the rest of the feed arrives; the operator restarts with a CHANGED cap
    # and a wiped checkpoint (everything replays as a new epoch 0)
    for i, f in enumerate(files[2:]):
        shutil.copy(f, os.path.join(stage, f"g{i:04d}.parquet"))
    shutil.rmtree(ck)
    r2 = _runner(spark, stage, t.path, ck)
    r2.max_files_per_trigger = 100
    r2.max_offsets_per_trigger = 500
    out2 = r2.run_available_now()
    assert any(sum(r.applied.values()) for r in out2), (
        "w=500 windows were fenced out by w=300 slice ids"
    )

    feed_pd = spark.read.parquet(feed_dir).drop("delivery_seq", "__batch").toPandas()
    assert_state_matches(t.refresh(), feed_pd, ["role", "text", "tool", "ts"])


def test_sliced_empty_batch_still_compacts(spark, tmp_path, feed_dir):
    """An empty micro-batch in sliced mode must still run the compaction
    cadence check, exactly like the unsliced path does — an early return
    before the cadence block would let deltas accumulate past
    compact_every whenever dedupe-at-ingest empties a trigger."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), [days("ts"), bucket(8, "conv_id")]
    )
    runner = _runner(spark, feed_dir, t.path, str(tmp_path / "ck"))
    runner.mode = "mor"
    runner.compact_every = 1  # every micro-batch should compact
    runner.max_offsets_per_trigger = 500

    # epoch 0: real data → deltas land and epoch-0 compaction runs
    batch0 = spark.read.parquet(feed_dir).limit(200)
    runner._apply_batch(batch0, 0)
    v_after_real = t.refresh().version

    # epoch 1: EMPTY micro-batch — no slices, but the cadence must still fire
    from pyspark.sql.types import LongType, StructField

    schema = event_schema(False).add(StructField("delivery_seq", LongType()))
    runner._apply_batch(spark.createDataFrame([], schema), 1)
    assert t.refresh().version > v_after_real, (
        "empty sliced micro-batch skipped the scheduled compaction"
    )


def test_jpeg_fill_bytes_before_marker_decode():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker
    code; a decoder that reads the fill byte as the code misparses the next
    real marker byte as a segment length. Inject fills before the first DQT
    and before EOI — the pixels must decode identically."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = codecs.encode_jpeg(px, quality=90)
    base = codecs.decode_jpeg(payload)

    i = payload.index(b"\xff\xdb")  # first DQT
    stuffed = payload[:i] + b"\xff\xff\xff" + payload[i:]
    # and in front of the trailing EOI (after the entropy-coded scan)
    assert stuffed.endswith(b"\xff\xd9")
    stuffed = stuffed[:-2] + b"\xff" + stuffed[-2:]
    out = codecs.decode_jpeg(stuffed)
    np.testing.assert_array_equal(out, base)


def test_scan_splits_non_splittable_gzip(spark, tmp_path):
    """A .json.gz file is non-splittable: Spark plans exactly one scan task
    for it no matter its size, so the split estimate must count it as ONE
    split (not size/maxPartitionBytes) or word_shingles skips the respread
    that protects the CPU-heavy fan-out from running serially."""
    gz = tmp_path / "docs.json.gz"
    with gzip.open(gz, "wt") as fh:
        for i in range(2000):
            fh.write('{"id": %d, "text": "%s"}\n' % (i, "word " * 40))
    assert os.path.getsize(gz) > 4096
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096b")
    try:
        df = spark.read.json(str(gz))
        assert df.rdd.getNumPartitions() == 1  # what Spark actually plans
        assert _scan_splits(df) == 1
        # splittable files keep the size-based estimate
        pq = str(tmp_path / "docs.parquet")
        df.write.parquet(pq)
        est = _scan_splits(spark.read.parquet(pq))
        total = sum(
            os.path.getsize(os.path.join(pq, n))
            for n in os.listdir(pq) if n.endswith(".parquet")
        )
        assert est >= max(total // 4096, 1)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_transport_deletes_empty_batch_without_rows_key(tmp_path):
    """A manifest missing its rows key in a directory with NO part-files has
    no data to preserve: it must be removed like the rows==0 legacy case,
    not quarantined into an ever-growing pile of empty .bad/.bad.N dirs."""
    export = str(tmp_path / "export")
    imp = str(tmp_path / "import")
    empty = os.path.join(export, "b-no-rows-no-parts")
    os.makedirs(empty)
    with open(os.path.join(empty, "_minimal.json"), "w") as fh:
        fh.write('{"batch": "b-no-rows-no-parts", "files": []}')

    assert transport_batches(export, imp) == []
    assert not os.path.exists(empty)  # deleted outright
    assert not os.path.exists(empty + ".bad")  # and never quarantined
