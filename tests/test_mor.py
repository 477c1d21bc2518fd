"""Merge-on-read mode: delta appends + read-time latest-wins must produce the
exact same table state as the copy-on-write MERGE, under the same adversarial
feed (out-of-order, delete-then-reinsert, schema evolution, replay)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from openmrs_module_epts_etl_spark.cdc import (
    CdcPipeline,
    FeedSpec,
    PipelineConfig,
    compact_latest,
    generate_feed,
    read_state,
    transcript_schema,
)
from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, days

from test_cdc_pipeline import oracle_df, payload_columns

SPEC = FeedSpec(
    n_events=4000, n_convs=40, max_turns=20, out_of_order_window=300,
    schema_evolution_lsn=2000,
)


@pytest.fixture(scope="module")
def feed(spark):
    df = generate_feed(spark, SPEC).persist()
    df.count()
    yield df
    df.unpersist()


def _mor_pipe(spark, tmp_path, tag, compact_every=None, dedupe_appends=False):
    t = LakeTable.create(
        spark, str(tmp_path / tag), transcript_schema(evolved=False),
        [days("ts"), bucket(8, "conv_id")],
    )
    cfg = PipelineConfig(
        table_path=t.path, checkpoint_dir=str(tmp_path / f"{tag}-ck"),
        batch_size=700, mode="mor", compact_every=compact_every,
        mor_dedupe_appends=dedupe_appends,
    )
    return t, CdcPipeline(spark, cfg)


def _assert_matches(spark, table, feed, pay):
    got = (
        read_state(table.refresh())
        .select("conv_id", "turn_idx", *pay)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    want = oracle_df(feed.drop("delivery_seq").toPandas(), pay).reset_index(drop=True)
    got["turn_idx"] = got["turn_idx"].astype("int64")
    want["turn_idx"] = want["turn_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mor_replay_matches_oracle(spark, tmp_path, feed):
    pay = payload_columns(feed.drop("delivery_seq").schema)
    t, pipe = _mor_pipe(spark, tmp_path, "t1")
    results = pipe.run(feed)
    assert len(results) > 3
    assert any(r.applied.get("delta_delete") for r in results)
    _assert_matches(spark, t, feed, pay)
    # evolved columns made it through the delta appends
    assert "tool_version" in t.refresh().read().columns


def test_mor_with_periodic_compaction_same_state(spark, tmp_path, feed):
    pay = payload_columns(feed.drop("delivery_seq").schema)
    t, pipe = _mor_pipe(spark, tmp_path, "t2", compact_every=3)
    pipe.run(feed)
    _assert_matches(spark, t, feed, pay)


def test_mor_compaction_shrinks_and_preserves(spark, tmp_path, feed):
    pay = payload_columns(feed.drop("delivery_seq").schema)
    t, pipe = _mor_pipe(spark, tmp_path, "t3")
    pipe.run(feed)
    t.refresh()
    rows_before = t.read(include_hidden=True).count()
    compact_latest(t, fence_key="manual-compact", epoch_id=0)
    t.refresh()
    rows_after = t.read(include_hidden=True).count()
    assert rows_after < rows_before  # version history collapsed
    _assert_matches(spark, t, feed, pay)
    # compaction is fenced: same epoch id is a no-op
    v = t.version
    assert compact_latest(t, fence_key="manual-compact", epoch_id=0) is None
    assert t.refresh().version == v


def test_mor_selective_compaction_bounded_and_state_invariant(spark, tmp_path, feed):
    """compact_partitions touches ONLY partitions at/over the file threshold:
    state is unchanged (local winners discard only globally-dominated rows),
    files in cold partitions are byte-identical survivors, and the hot
    partitions collapse. A second run at the same fence is a no-op."""
    from collections import Counter

    from openmrs_module_epts_etl_spark.cdc import compact_partitions

    pay = payload_columns(feed.drop("delivery_seq").schema)
    t, pipe = _mor_pipe(spark, tmp_path, "t3sel")
    pipe.run(feed)
    t.refresh()
    files_before = {f.path for f in t.files}
    per_part = Counter(tuple(sorted(f.partition.items())) for f in t.files)
    thresh = 4
    hot = {p for p, n in per_part.items() if n >= thresh}
    cold_files = {
        f.path for f in t.files if tuple(sorted(f.partition.items())) not in hot
    }
    assert hot and cold_files, "feed must produce both hot and cold partitions"
    c = compact_partitions(t, min_files=thresh, fence_key="sel-compact", epoch_id=0)
    assert c is not None
    t.refresh()
    files_after = {f.path for f in t.files}
    # cold partitions untouched — the bounded-I/O guarantee
    assert cold_files <= files_after
    # hot partitions rewritten: none of their old files survive
    assert not (files_before - cold_files) & files_after
    _assert_matches(spark, t, feed, pay)
    # fenced: replay is a no-op
    v = t.version
    assert compact_partitions(t, min_files=thresh, fence_key="sel-compact", epoch_id=0) is None
    assert t.refresh().version == v
    # below-threshold table: nothing qualifies, no commit
    assert compact_partitions(t, min_files=10_000) is None


def test_mor_pipeline_policy_compaction(spark, tmp_path, feed):
    """PipelineConfig.compact_min_files routes the periodic compaction to
    the partition-selective path; final state still matches the oracle."""
    pay = payload_columns(feed.drop("delivery_seq").schema)
    t = LakeTable.create(
        spark, str(tmp_path / "t3pol"), transcript_schema(evolved=False),
        [days("ts"), bucket(8, "conv_id")],
    )
    cfg = PipelineConfig(
        table_path=t.path, checkpoint_dir=str(tmp_path / "t3pol-ck"),
        batch_size=700, mode="mor", compact_every=3, compact_min_files=3,
    )
    CdcPipeline(spark, cfg).run(feed)
    _assert_matches(spark, t, feed, pay)


def test_mor_dedupe_appends_same_state_fewer_rows(spark, tmp_path, feed):
    """mor_dedupe_appends=True pre-collapses each epoch per key: identical
    final state (read-time winner selection is the same), strictly fewer
    delta rows on disk (the epochs here average >1 event per key)."""
    pay = payload_columns(feed.drop("delivery_seq").schema)
    t_plain, pipe_plain = _mor_pipe(spark, tmp_path, "t-nodd")
    pipe_plain.run(feed)
    t_dd, pipe_dd = _mor_pipe(spark, tmp_path, "t-dd", dedupe_appends=True)
    pipe_dd.run(feed)
    _assert_matches(spark, t_dd, feed, pay)
    rows_plain = t_plain.refresh().read(include_hidden=True).count()
    rows_dd = t_dd.refresh().read(include_hidden=True).count()
    assert rows_dd < rows_plain


def test_mor_replay_idempotent(spark, tmp_path, feed):
    pay = payload_columns(feed.drop("delivery_seq").schema)
    t, pipe = _mor_pipe(spark, tmp_path, "t4")
    pipe.run(feed)
    v = t.refresh().version
    # lost checkpoint, same feed: every epoch fenced; state unchanged
    cfg = PipelineConfig(
        table_path=t.path, checkpoint_dir=str(tmp_path / "t4-ck-new"),
        batch_size=700, mode="mor",
    )
    out = CdcPipeline(spark, cfg).run(feed)
    assert all(r.skipped_epoch for r in out)
    assert t.refresh().version == v
    _assert_matches(spark, t, feed, pay)


def test_mor_stale_insert_after_delete_fenced(spark, tmp_path):
    """Out-of-order stale insert delivered in a later epoch than the delete
    must not resurrect the key — read-time max_by(lsn) sees the tombstone."""
    import datetime as dt

    from openmrs_module_epts_etl_spark.cdc import append_delta
    from openmrs_module_epts_etl_spark.cdc.schemas import event_schema

    ts = dt.datetime(2026, 1, 1)
    rows1 = [(5, "D", "c1", 0, None, None, None, ts, "o")]
    rows2 = [(3, "I", "c1", 0, "user", "stale", None, ts, "o")]
    t = LakeTable.create(
        spark, str(tmp_path / "t5"), transcript_schema(), [days("ts"), bucket(4, "conv_id")]
    )
    append_delta(t, spark.createDataFrame(rows1, event_schema()), fence_key="f", epoch_id=0)
    append_delta(t.refresh(), spark.createDataFrame(rows2, event_schema()), fence_key="f", epoch_id=1)
    assert read_state(t.refresh()).count() == 0


def test_pipeline_chaining_via_incremental_read(spark, tmp_path):
    """Table A is MoR-ingested from the feed; a DOWNSTREAM pipeline tails A's
    incremental changes (table_changes_as_feed) and merges them into table B.
    B's final user state must equal A's — the lake-side analog of chaining
    sync stages through detected_record_info."""
    from openmrs_module_epts_etl_spark.cdc import (
        append_delta,
        merge_into,
        read_state,
        table_changes_as_feed,
    )

    feed = generate_feed(spark, SPEC, num_partitions=8).persist()
    a = LakeTable.create(
        spark, str(tmp_path / "a"), transcript_schema(evolved=True),
        [days("ts"), bucket(8, "conv_id")],
    )
    v_marks = [a.version]
    # ingest the feed into A as 3 MoR delta epochs
    bounds = feed.agg(F.min("delivery_seq"), F.max("delivery_seq")).collect()[0]
    span = (int(bounds[1]) - int(bounds[0])) // 3 + 1
    for e in range(3):
        b = feed.filter(
            (F.col("delivery_seq") >= int(bounds[0]) + e * span)
            & (F.col("delivery_seq") < int(bounds[0]) + (e + 1) * span)
        ).drop("delivery_seq")
        append_delta(a, b, fence_key="chain-a", epoch_id=e)
        a.refresh()
        v_marks.append(a.version)

    b_table = LakeTable.create(
        spark, str(tmp_path / "b"), transcript_schema(evolved=True),
        [days("ts"), bucket(8, "conv_id")],
    )
    # downstream: consume A's increments epoch by epoch into B
    for e in range(3):
        changes = table_changes_as_feed(a, v_marks[e], v_marks[e + 1])
        merge_into(b_table, changes, fence_key="chain-b", epoch_id=e)
        b_table.refresh()

    key = ["conv_id", "turn_idx"]
    a_state = read_state(a).orderBy(*key).toPandas()
    b_state = b_table.read().select(*a_state.columns).orderBy(*key).toPandas()
    pd.testing.assert_frame_equal(a_state, b_state, check_dtype=False)
