"""Process orchestration (process.py): serial/parallel item modes, operation
chaining, status files, stop-request, already-finished short-circuit — the
ProcessController/OperationController control plane re-expressed."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from openmrs_module_epts_etl_spark.config import (
    DstConfig,
    EtlItemConfig,
    FieldMapping,
    register_transformer,
)
from openmrs_module_epts_etl_spark.lake import LakeTable
from openmrs_module_epts_etl_spark.process import (
    OperationConfig,
    ProcessRunner,
    ProcessStopped,
)

CALLS: list[str] = []


@register_transformer("record_call_a")
def _rec_a(df):
    CALLS.append("a")
    return df


@register_transformer("record_call_b")
def _rec_b(df):
    CALLS.append("b")
    return df


DST_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("_lsn", LongType()),
        StructField("_origin", StringType()),
        StructField(
            "_deleted", __import__("pyspark.sql.types", fromlist=["BooleanType"]).BooleanType()
        ),
    ]
)


def _item(spark, tmp_path, name, transformer=None):
    src_path = str(tmp_path / f"src-{name}.parquet")
    spark.createDataFrame(
        [(1, f"{name}-one"), (2, f"{name}-two")], "id long, name string"
    ).write.mode("overwrite").parquet(src_path)
    t = LakeTable.create(spark, str(tmp_path / f"t-{name}"), DST_SCHEMA, [])
    return EtlItemConfig(
        name=name,
        src_path=src_path,
        transformer=transformer,
        dsts=[
            DstConfig(
                table_path=t.path,
                key=["id"],
                mappings=[FieldMapping(dst="id"), FieldMapping(dst="name")],
            )
        ],
    )


def _state(spark, item):
    t = LakeTable(spark, item.dsts[0].table_path)
    return {r["id"]: r["name"] for r in t.read().collect()}


def test_serial_run_status_and_short_circuit(spark, tmp_path):
    items = [_item(spark, tmp_path, "i1"), _item(spark, tmp_path, "i2")]
    runner = ProcessRunner(spark, "proc", str(tmp_path / "status"))
    op = OperationConfig(name="load", items=items)
    out = runner.run([op], run_id=0)
    assert out["load"]["state"] == "FINISHED"
    assert set(out["load"]["items"]) == {"i1", "i2"}
    assert _state(spark, items[0]) == {1: "i1-one", 2: "i1-two"}
    v1 = LakeTable(spark, items[0].dsts[0].table_path).version
    # same run id again: short-circuits on the status file, tables untouched
    out2 = runner.run([op], run_id=0)
    assert out2["load"]["state"] == "FINISHED"
    assert LakeTable(spark, items[0].dsts[0].table_path).version == v1
    # a NEW run id re-executes (fences are per-epoch) but the merge is
    # idempotent: state unchanged
    runner.run([op], run_id=1)
    assert _state(spark, items[0]) == {1: "i1-one", 2: "i1-two"}


def test_parallel_mode_same_state(spark, tmp_path):
    items = [_item(spark, tmp_path, f"p{i}") for i in range(3)]
    runner = ProcessRunner(spark, "proc", str(tmp_path / "status"))
    out = runner.run(
        [OperationConfig(name="par", items=items, processing_mode="parallel")], run_id=0
    )
    assert out["par"]["state"] == "FINISHED"
    for it in items:
        assert _state(spark, it) == {1: f"{it.name}-one", 2: f"{it.name}-two"}


def test_chaining_order(spark, tmp_path):
    CALLS.clear()
    parent = _item(spark, tmp_path, "parent", transformer="record_call_a")
    child = _item(spark, tmp_path, "child", transformer="record_call_b")
    ops = [
        OperationConfig(
            name="root",
            items=[parent],
            children=[OperationConfig(name="leaf", items=[child])],
        )
    ]
    out = ProcessRunner(spark, "proc", str(tmp_path / "status")).run(ops, run_id=0)
    assert CALLS == ["a", "b"]  # child ran strictly after parent
    assert out["root"]["state"] == "FINISHED" and out["leaf"]["state"] == "FINISHED"


def test_stop_request_and_resume(spark, tmp_path):
    items = [_item(spark, tmp_path, "s1"), _item(spark, tmp_path, "s2")]
    runner = ProcessRunner(spark, "proc", str(tmp_path / "status"))
    runner.request_stop()
    with pytest.raises(ProcessStopped):
        runner.run([OperationConfig(name="op", items=items)], run_id=0)
    # nothing ran
    assert _state(spark, items[0]) == {}
    # clear the stop file → full run completes
    import os

    os.remove(str(tmp_path / "status" / "stop"))
    out = runner.run([OperationConfig(name="op", items=items)], run_id=0)
    assert out["op"]["state"] == "FINISHED"
    assert _state(spark, items[1]) == {1: "s2-one", 2: "s2-two"}


def test_bad_processing_mode_rejected():
    with pytest.raises(ValueError):
        OperationConfig(name="x", processing_mode="both")
