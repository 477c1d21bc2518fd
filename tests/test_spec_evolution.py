"""Partition spec evolution: metadata-only layout change, correctness of
merges against pre-evolution files (including the dangerous same-name
rebucket case), and migrate_layout restoring a uniform layout."""

from __future__ import annotations

import pandas as pd

from openmrs_module_epts_etl_spark.cdc import (
    FeedSpec,
    generate_feed,
    merge_into,
    transcript_schema,
)
from openmrs_module_epts_etl_spark.cdc.schemas import payload_columns as _pc
from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, days, migrate_layout


def payload_columns(schema):
    return [
        c
        for c in _pc(schema)
        if c not in ("conv_id", "turn_idx", "delivery_seq") and not c.startswith("_")
    ]


def assert_state_matches(table, feed_pd, pcols):
    import duckdb

    got = (
        table.read(include_hidden=False)
        .select("conv_id", "turn_idx", *pcols)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", feed_pd)
    cols = ", ".join(pcols)
    want = con.execute(
        f"""
        WITH ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
            FROM ev)
        SELECT conv_id, turn_idx, {cols}
        FROM ranked WHERE rn = 1 AND op IN ('I','U')
        ORDER BY conv_id, turn_idx
        """
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

SPEC = FeedSpec(
    n_events=3000,
    n_convs=30,
    max_turns=20,
    out_of_order_window=200,
    schema_evolution_lsn=None,
)


def _replay(spark, table, feed, lo, hi, epoch_id):
    # lsns are 1-based; hi=None means "to the end"
    cond = feed.lsn >= lo if hi is None else (feed.lsn >= lo) & (feed.lsn < hi)
    merge_into(
        table, feed.filter(cond).drop("delivery_seq"), fence_key="t", epoch_id=epoch_id
    )


def test_rebucket_evolution_keeps_merge_correct(spark, tmp_path):
    """bucket(2)→bucket(4) keeps the partition NAME but changes the
    derivation — the case where naive partition-value pruning would silently
    skip pre-evolution files and leave duplicate/stale rows behind."""
    feed = generate_feed(spark, SPEC).cache()
    feed_pd = feed.toPandas()
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        transcript_schema(),
        [bucket(2, "conv_id")],
    )
    pcols = payload_columns(t.schema)

    _replay(spark, t, feed, 0, 1500, 0)
    assert t.spec_id == 0
    old_files = set(f.path for f in t.files)

    t.evolve_partition_spec([bucket(4, "conv_id")])
    assert t.spec_id == 1
    assert set(f.path for f in t.files) == old_files  # metadata-only
    assert all(f.spec_id == 0 for f in t.files)

    # second half updates/deletes keys living in spec-0 files: the merge must
    # rewrite those files (probe path), not prune them by the new bucketing
    _replay(spark, t, feed, 1500, None, 1)
    assert_state_matches(t, feed_pd, pcols)
    # every rewritten/added file carries the current spec id
    assert any(f.spec_id == 1 for f in t.files)


def test_migrate_layout_sweeps_old_files(spark, tmp_path):
    feed = generate_feed(spark, SPEC).cache()
    feed_pd = feed.toPandas()
    t = LakeTable.create(
        spark,
        str(tmp_path / "m"),
        transcript_schema(),
        [bucket(2, "conv_id")],
    )
    pcols = payload_columns(t.schema)
    _replay(spark, t, feed, 0, None, 0)

    t.evolve_partition_spec([days("ts"), bucket(4, "conv_id")])
    n_old = sum(1 for f in t.files if f.spec_id != t.spec_id)
    assert n_old > 0

    # bounded sweep first, then the rest
    m1 = migrate_layout(t, max_files=max(1, n_old // 2))
    assert m1["migrated_files"] >= 1
    m2 = migrate_layout(t)
    assert m2["remaining_old_files"] == 0
    assert all(f.spec_id == t.spec_id for f in t.files)
    # migrated files are laid out by the new spec (both dims present)
    assert all(
        {"ts_day", "conv_id_bucket"} <= set(f.partition) for f in t.files
    )
    assert_state_matches(t, feed_pd, pcols)
    # idempotent once clean
    assert migrate_layout(t)["migrated_files"] == 0


def test_partition_filter_never_prunes_old_spec_files(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "p"),
        transcript_schema(),
        [bucket(2, "conv_id")],
    )
    feed = generate_feed(spark, SPEC)
    merge_into(
        t, feed.filter(feed.lsn < 1000).drop("delivery_seq"), fence_key="t", epoch_id=0
    )
    total = t.read().count()
    t.evolve_partition_spec([bucket(8, "conv_id")])
    # a filter that matches nothing in the new layout must still read every
    # pre-evolution file (their values were derived under bucket(2))
    got = t.read(partition_filter=lambda p: False).count()
    assert got == total


def test_evolution_survives_occ_and_history(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "h"),
        transcript_schema(),
        [bucket(2, "conv_id")],
    )
    v0 = t.version
    t.evolve_partition_spec([days("ts"), bucket(4, "conv_id")])
    assert t.version == v0 + 1
    assert [p.transform for p in t.partition_spec] == [
        "days(ts)",
        "bucket(4, conv_id)",
    ]
    # subsequent plain commits carry the evolved spec + id forward
    feed = generate_feed(spark, FeedSpec(n_events=200, n_convs=5, max_turns=10))
    merge_into(t, feed.drop("delivery_seq"), fence_key="t", epoch_id=0)
    assert t.spec_id == 1
    assert [p.transform for p in t.partition_spec] == [
        "days(ts)",
        "bucket(4, conv_id)",
    ]
