"""Regression tests for file-identity plumbing inside the merge:

1. the old-spec file probe must capture ``input_file_name()`` AT SCAN TIME —
   selected after the semi-join it returns '' once the batch outgrows the
   broadcast-hint cap and the join runs sort-merge, so matched pre-evolution
   files silently escaped rewrite (stale duplicate next to the new row);
2. hive-escaped partition directory names (identity partitions on values
   containing space/':'/'%') must round-trip: ``input_file_name()`` returns a
   percent-encoded URI and the manifest stores the raw value, so both the
   endswith file matching and the partition-tuple pruning need unescaping.
"""

from __future__ import annotations

import datetime as dt

import pytest

from openmrs_module_epts_etl_spark.cdc import (
    FeedSpec,
    generate_feed,
    merge_into,
    transcript_schema,
)
from openmrs_module_epts_etl_spark.cdc import merge as merge_mod
from openmrs_module_epts_etl_spark.cdc.schemas import event_schema
from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, identity


def _events(spark, rows):
    ts = dt.datetime(2024, 1, 5, 10, 0, 0)
    data = [
        (lsn, op, conv, turn, role, text, "t0", ts, "src")
        for (lsn, op, conv, turn, role, text) in rows
    ]
    return spark.createDataFrame(data, event_schema())


def test_old_spec_probe_survives_sort_merge_join(spark, tmp_path, monkeypatch):
    """Same scenario as test_rebucket_evolution_keeps_merge_correct, but with
    the broadcast-keys hint disabled so the old-file probe's semi-join runs
    as sort-merge — the strategy under which a post-join input_file_name()
    returns ''."""
    monkeypatch.setattr(merge_mod, "BROADCAST_KEYS_MAX_ROWS", -1)
    feed = generate_feed(
        spark,
        FeedSpec(
            n_events=2000, n_convs=20, max_turns=20,
            out_of_order_window=100, schema_evolution_lsn=None,
        ),
    ).cache()
    t = LakeTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), [bucket(2, "conv_id")]
    )
    merge_into(t, feed.filter(feed.lsn < 1000).drop("delivery_seq"),
               fence_key="p", epoch_id=0)
    t.evolve_partition_spec([bucket(4, "conv_id")])
    merge_into(t, feed.filter(feed.lsn >= 1000).drop("delivery_seq"),
               fence_key="p", epoch_id=1)
    live = t.read().select("conv_id", "turn_idx")
    assert live.count() == live.distinct().count()  # one row per key
    # the winning (max-lsn I/U) text must be live for every key
    import duckdb

    got = (
        t.read().select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx").toPandas()
    )
    con = duckdb.connect()
    con.register("ev", feed.toPandas())
    want = con.execute(
        """
        WITH ranked AS (SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) rn FROM ev)
        SELECT conv_id, turn_idx, text FROM ranked
        WHERE rn = 1 AND op IN ('I','U') ORDER BY conv_id, turn_idx
        """
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


ROLES = ["user u", "assistant:main", "tool 50%", "plain"]


@pytest.mark.parametrize("force_sort_merge", [False, True])
def test_identity_partition_hive_escaped_values(
    spark, tmp_path, monkeypatch, force_sort_merge
):
    """Identity partition on a column whose values hive-escape (space, ':',
    '%'): both the current-spec partition-tuple rewrite selection and the
    old-spec file probe must still find the files."""
    if force_sort_merge:
        monkeypatch.setattr(merge_mod, "BROADCAST_KEYS_MAX_ROWS", -1)
    t = LakeTable.create(
        spark, str(tmp_path / "i"), transcript_schema(), [identity("role")]
    )
    ins = _events(
        spark,
        [(i + 1, "I", f"c{i % 4}", i // 4, ROLES[i % 4], f"v1-{i}") for i in range(16)],
    )
    merge_into(t, ins, fence_key="i", epoch_id=0)
    assert any("%" in f.path for f in t.files)  # escaping actually exercised
    assert {f.partition["role"] for f in t.files} == set(ROLES)  # raw in manifest

    # current-spec rewrite path: update half the keys in-place
    upd = _events(
        spark,
        [(100 + i, "U", f"c{i % 4}", i // 4, ROLES[i % 4], f"v2-{i}") for i in range(8)],
    )
    merge_into(t, upd, fence_key="i", epoch_id=1)
    live = t.read().select("conv_id", "turn_idx")
    assert live.count() == 16
    assert live.distinct().count() == 16
    assert t.read().filter("text like 'v2-%'").count() == 8

    # old-spec probe path: evolve the layout, then update keys living in
    # escaped pre-evolution directories
    t.evolve_partition_spec([bucket(4, "conv_id")])
    upd2 = _events(
        spark,
        [(200 + i, "U", f"c{i % 4}", i // 4, ROLES[i % 4], f"v3-{i}") for i in range(16)],
    )
    merge_into(t, upd2, fence_key="i", epoch_id=2)
    live = t.read()
    assert live.count() == 16
    assert live.select("conv_id", "turn_idx").distinct().count() == 16
    assert live.filter("text like 'v3-%'").count() == 16
