"""Conflict-resolution policy catalog (cdc/conflict.py) vs hand-computed
expected states — the ConflictResolutionType analogs:
KEEP_EXISTING / UPDATE_EXISTING / winningRecordFieldsInfo /
observationDateFields (api:conf/types/ConflictResolutionType.java:1-47,
api:model/EtlDatabaseObject.java:614-726)."""

from __future__ import annotations

import datetime as dt

import pytest

from openmrs_module_epts_etl_spark.cdc import (
    KEEP_EXISTING,
    UPDATE_EXISTING,
    CdcPipeline,
    ConflictPolicy,
    PipelineConfig,
    merge_into,
    transcript_schema,
)
from openmrs_module_epts_etl_spark.cdc.schemas import EVENT_SCHEMA
from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, days

T0 = dt.datetime(2025, 1, 1, 10, 0, 0)
T1 = dt.datetime(2025, 1, 1, 11, 0, 0)
T2 = dt.datetime(2025, 1, 1, 12, 0, 0)


def ev(lsn, op, conv, turn, role="user", text=None, tool=None, ts=T1, origin="o1"):
    return (lsn, op, conv, turn, role, text, tool, ts, origin)


def make_table(spark, path):
    return LakeTable.create(
        spark, str(path), transcript_schema(), [days("ts"), bucket(4, "conv_id")]
    )


def batch(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def state(table):
    rows = table.read().select("conv_id", "turn_idx", "role", "text").collect()
    return {(r.conv_id, r.turn_idx): (r.role, r.text) for r in rows}


def test_keep_existing(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    merge_into(t, batch(spark, [ev(1, "I", "c1", 0, text="v1"), ev(2, "I", "c1", 1, text="v2")]),
               policy=KEEP_EXISTING)
    res = merge_into(
        t,
        batch(spark, [ev(10, "U", "c1", 0, text="v1-changed"), ev(11, "I", "c2", 0, text="v3")]),
        policy=KEEP_EXISTING,
    )
    # matched live row kept, unmatched row inserted
    assert res.applied.get("policy_keep") == 1
    assert res.applied.get("insert") == 1
    assert state(t) == {
        ("c1", 0): ("user", "v1"),
        ("c1", 1): ("user", "v2"),
        ("c2", 0): ("user", "v3"),
    }


def test_update_existing_overwrites_even_stale_lsn(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    merge_into(t, batch(spark, [ev(100, "I", "c1", 0, text="newest")]), policy=UPDATE_EXISTING)
    res = merge_into(
        t, batch(spark, [ev(5, "U", "c1", 0, text="stale-but-wins")]), policy=UPDATE_EXISTING
    )
    assert res.applied.get("update") == 1
    assert state(t)[("c1", 0)] == ("user", "stale-but-wins")
    # the lsn fence never regresses even when an older event's payload applies
    hidden = t.read(include_hidden=True).select("_lsn").collect()
    assert hidden[0]._lsn == 100


def test_winning_fields(spark, tmp_path):
    pol = ConflictPolicy(kind="winning_fields", winning_groups=[{"role": "assistant"}])
    t = make_table(spark, tmp_path / "t")
    merge_into(
        t,
        batch(spark, [ev(1, "I", "c1", 0, text="a"), ev(2, "I", "c1", 1, text="b")]),
        policy=pol,
    )
    res = merge_into(
        t,
        batch(
            spark,
            [
                ev(10, "U", "c1", 0, role="assistant", text="a2"),  # winning value → applies
                ev(11, "U", "c1", 1, role="user", text="b2"),  # not winning → kept
            ],
        ),
        policy=pol,
    )
    assert res.applied.get("update") == 1
    assert res.applied.get("policy_keep") == 1
    assert state(t) == {("c1", 0): ("assistant", "a2"), ("c1", 1): ("user", "b")}


def test_observation_dates(spark, tmp_path):
    pol = ConflictPolicy(kind="observation_dates", observation_fields=["ts"])
    t = make_table(spark, tmp_path / "t")
    merge_into(t, batch(spark, [ev(1, "I", "c1", 0, text="first", ts=T1)]), policy=pol)
    # older observation date loses regardless of higher lsn
    r1 = merge_into(t, batch(spark, [ev(10, "U", "c1", 0, text="older-obs", ts=T0)]), policy=pol)
    assert r1.applied.get("policy_keep") == 1
    # strictly newer observation date wins
    r2 = merge_into(t, batch(spark, [ev(11, "U", "c1", 0, text="newer-obs", ts=T2)]), policy=pol)
    assert r2.applied.get("update") == 1
    assert state(t)[("c1", 0)] == ("user", "newer-obs")


def test_policy_delete_and_reinsert_use_lsn_guard(spark, tmp_path):
    # deletes and tombstoned dst rows bypass the policy: a KEEP_EXISTING table
    # must still be deletable and reinsertable (reference dispatches DELETE as
    # its own action; a deleted record is "not found" by conflict lookup)
    t = make_table(spark, tmp_path / "t")
    merge_into(t, batch(spark, [ev(1, "I", "c1", 0, text="v1", ts=T1)]), policy=KEEP_EXISTING)
    rd = merge_into(t, batch(spark, [ev(5, "D", "c1", 0, ts=T1)]), policy=KEEP_EXISTING)
    assert rd.applied.get("delete") == 1
    assert state(t) == {}
    # stale out-of-order insert below the tombstone lsn stays fenced
    rs = merge_into(t, batch(spark, [ev(3, "I", "c1", 0, text="stale", ts=T1)]), policy=KEEP_EXISTING)
    assert rs.applied.get("stale_skip") == 1
    assert state(t) == {}
    # newer reinsert resurrects the key through the tombstone
    rr = merge_into(t, batch(spark, [ev(9, "I", "c1", 0, text="v2", ts=T1)]), policy=KEEP_EXISTING)
    assert rr.applied.get("update") == 1
    assert state(t)[("c1", 0)] == ("user", "v2")
    # …and from then on the policy governs live-row conflicts again
    rk = merge_into(t, batch(spark, [ev(20, "U", "c1", 0, text="v3", ts=T1)]), policy=KEEP_EXISTING)
    assert rk.applied.get("policy_keep") == 1
    assert state(t)[("c1", 0)] == ("user", "v2")


def test_pipeline_threads_policy_and_rejects_mor(spark, tmp_path):
    cfg = PipelineConfig(
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        policy=KEEP_EXISTING,
        batch_size=10,
    )
    make_table(spark, tmp_path / "t")
    rows = [ev(0, "I", "c1", 0, text="v1") + (0,), ev(15, "U", "c1", 0, text="v2") + (15,)]
    # copy — StructType.add mutates in place and EVENT_SCHEMA is shared
    from pyspark.sql.types import LongType, StructField, StructType

    feed = spark.createDataFrame(
        rows, StructType(list(EVENT_SCHEMA.fields) + [StructField("delivery_seq", LongType())])
    )
    results = CdcPipeline(spark, cfg).run(feed)
    assert len(results) == 2
    t = LakeTable(spark, cfg.table_path)
    assert state(t)[("c1", 0)] == ("user", "v1")  # KEEP_EXISTING held across epochs

    bad = PipelineConfig(
        table_path=str(tmp_path / "t2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
        policy=KEEP_EXISTING,
        mode="mor",
    )
    with pytest.raises(ValueError, match="cow"):
        CdcPipeline(spark, bad).run(feed)


def test_policy_validation():
    with pytest.raises(ValueError):
        ConflictPolicy(kind="nope")
    with pytest.raises(ValueError):
        ConflictPolicy(kind="winning_fields")
    with pytest.raises(ValueError):
        ConflictPolicy(kind="observation_dates")
