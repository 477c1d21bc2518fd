"""rollback_to_version: state restoration, fence invalidation → replay
re-applies undone epochs, rollback-of-rollback revalidation, and fence
survival through snapshot expiration."""

from __future__ import annotations

import pandas as pd
import pytest

from openmrs_module_epts_etl_spark.cdc import (
    CdcPipeline,
    FeedSpec,
    PipelineConfig,
    generate_feed,
    transcript_schema,
)
from openmrs_module_epts_etl_spark.lake import (
    LakeTable,
    bucket,
    days,
    expire_snapshots,
    rollback_to_version,
)

SPEC = FeedSpec(
    n_events=4000, n_convs=40, max_turns=20, out_of_order_window=300,
    schema_evolution_lsn=None,
)


def _state(spark, path: str) -> pd.DataFrame:
    df = LakeTable(spark, path).read().orderBy("conv_id", "turn_idx").toPandas()
    return df.reset_index(drop=True)


def _run(spark, feed, path, ckpt, **kw):
    cfg = PipelineConfig(table_path=path, checkpoint_dir=ckpt, batch_size=1000)
    return CdcPipeline(spark, cfg).run(feed, **kw)


@pytest.fixture()
def setup(spark, tmp_path):
    feed = generate_feed(spark, SPEC).persist()
    feed.count()
    path = str(tmp_path / "tbl")
    LakeTable.create(
        spark, path, transcript_schema(), [days("ts"), bucket(8, "conv_id")]
    )
    yield feed, path, tmp_path
    feed.unpersist()


def test_rollback_restores_state_and_replay_converges(spark, setup):
    feed, path, tmp = setup
    _run(spark, feed, path, str(tmp / "ck1"), max_epochs=2)
    t = LakeTable(spark, path)
    v_mid = t.version
    mid_state = _state(spark, path)

    _run(spark, feed, path, str(tmp / "ck1"))
    head_state = _state(spark, path)
    assert len(head_state) > len(mid_state)

    rollback_to_version(LakeTable(spark, path), v_mid)
    pd.testing.assert_frame_equal(_state(spark, path), mid_state)

    # fences of epochs ≤ v_mid hold; the undone epochs' fences are dropped
    t = LakeTable(spark, path)
    assert t.epoch_already_applied("cdc-pipeline", 0)
    assert not t.epoch_already_applied("cdc-pipeline", 3)

    # replay with a fresh checkpoint but the same fence_key: early epochs
    # skip (still fenced), undone epochs re-apply, state converges to head
    results = _run(spark, feed, path, str(tmp / "ck2"))
    skipped = [r.skipped_epoch for r in results]
    assert skipped[0] and skipped[1] and not skipped[-1]
    pd.testing.assert_frame_equal(_state(spark, path), head_state)


def test_rollback_of_rollback_revalidates_fences(spark, setup):
    feed, path, tmp = setup
    _run(spark, feed, path, str(tmp / "ck1"))
    t = LakeTable(spark, path)
    v_head = t.version
    head_state = _state(spark, path)
    v_mid = 2  # after two epoch commits

    rollback_to_version(LakeTable(spark, path), v_mid)
    t = LakeTable(spark, path)
    assert not t.epoch_already_applied("cdc-pipeline", 3)

    # roll the rollback back: state AND fence set return to head — a full
    # replay must be all no-ops again
    rollback_to_version(LakeTable(spark, path), v_head)
    pd.testing.assert_frame_equal(_state(spark, path), head_state)
    results = _run(spark, feed, path, str(tmp / "ck2"))
    assert all(r.skipped_epoch for r in results)
    pd.testing.assert_frame_equal(_state(spark, path), head_state)


def test_rollback_fence_edits_survive_expiration(spark, setup):
    feed, path, tmp = setup
    _run(spark, feed, path, str(tmp / "ck1"))
    t = LakeTable(spark, path)
    v_mid = 2
    rollback_to_version(t, v_mid)
    mid_state = _state(spark, path)

    # expire everything but the rollback head: the expired epoch commits'
    # fences fold into the sidecar and the expired rollback's edits replay
    # into it in order, so the undone epochs remain un-fenced
    expire_snapshots(LakeTable(spark, path), keep_last=1)
    t = LakeTable(spark, path)
    assert t.epoch_already_applied("cdc-pipeline", 0)
    assert not t.epoch_already_applied("cdc-pipeline", 3)
    pd.testing.assert_frame_equal(_state(spark, path), mid_state)

    results = _run(spark, feed, path, str(tmp / "ck2"))
    assert not results[-1].skipped_epoch


def test_rollback_invalidation_reaches_other_live_handles(spark, setup):
    """A long-lived handle's fence cache must see another handle's rollback —
    a stale cache would keep skipping the undone epochs forever."""
    feed, path, tmp = setup
    _run(spark, feed, path, str(tmp / "ck1"))
    a = LakeTable(spark, path)
    assert a.epoch_already_applied("cdc-pipeline", 3)  # cache built on handle A

    rollback_to_version(LakeTable(spark, path), 2)  # handle B
    assert not a.epoch_already_applied("cdc-pipeline", 3)
    assert a.epoch_already_applied("cdc-pipeline", 0)


def test_rollback_handles_none_epoch_ids(spark, setup):
    """Fenced commits without epoch ids (epoch_id=None) must not crash the
    fence-set sort."""
    feed, path, tmp = setup
    _run(spark, feed, path, str(tmp / "ck1"), max_epochs=2)
    t = LakeTable(spark, path)
    v_mid = t.version
    # a manual fenced commit with no epoch id, then more epochs
    t.commit([], epoch={"fence_key": "manual", "epoch_id": None})
    _run(spark, feed, path, str(tmp / "ck1"))
    c = rollback_to_version(LakeTable(spark, path), v_mid)
    inv = {tuple(e) for e in c.metrics["invalidated_fences"]}
    assert ("manual", None) in inv
    assert not LakeTable(spark, path).epoch_already_applied("manual", None)


def test_rollback_across_spec_evolution_restores_spec_id(spark, setup):
    """Rolling back across a partition-spec evolution must restore the
    target's spec UNDER ITS ORIGINAL ID — a freshly minted id would mark
    every restored file old-layout and defeat all partition pruning."""
    feed, path, tmp = setup
    _run(spark, feed, path, str(tmp / "ck1"), max_epochs=2)
    t = LakeTable(spark, path)
    v_mid, spec_mid, sid_mid = t.version, t._commit.partition_spec, t.spec_id

    t.evolve_partition_spec([days("ts"), bucket(32, "conv_id")])
    _run(spark, feed, path, str(tmp / "ck1"))

    rollback_to_version(LakeTable(spark, path), v_mid)
    t2 = LakeTable(spark, path)
    assert t2.spec_id == sid_mid
    assert t2._commit.partition_spec == spec_mid
    # every restored file is current-layout again: pruning stays fully armed
    assert all(f.spec_id == t2.spec_id for f in t2.files)


def test_rollback_rejects_bad_targets(spark, setup):
    feed, path, tmp = setup
    _run(spark, feed, path, str(tmp / "ck1"), max_epochs=1)
    t = LakeTable(spark, path)
    with pytest.raises(ValueError):
        rollback_to_version(t, t.version)  # not strictly earlier
    with pytest.raises(ValueError):
        rollback_to_version(t, 999)  # ahead of head
    # an expired target version has no commit file left to restore from
    _run(spark, feed, path, str(tmp / "ck1"))
    expire_snapshots(LakeTable(spark, path), keep_last=2)
    with pytest.raises(FileNotFoundError):
        rollback_to_version(LakeTable(spark, path), 1)
