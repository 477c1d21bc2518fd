"""End-to-end file-based remote sync as chained typed operations:
EXPORT → TRANSPORT → LOAD (api:transport/processor/TransportProcessor.java,
api:dbquickexport / dbquickload controllers), driven through ProcessRunner
exactly as the CLI config would wire it. The destination table state must
converge to the exported source rows, and a re-run with a new run id must be
idempotent (export skips published batches; the merge lsn-guard absorbs the
replayed upserts)."""

from __future__ import annotations

import os

from pyspark.sql.types import BooleanType, LongType, StringType, StructField, StructType

from openmrs_module_epts_etl_spark.config import DstConfig, EtlItemConfig, FieldMapping
from openmrs_module_epts_etl_spark.lake import LakeTable
from openmrs_module_epts_etl_spark.process import OperationConfig, ProcessRunner

DST_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("_lsn", LongType()),
        StructField("_origin", StringType()),
        StructField("_deleted", BooleanType()),
    ]
)


def _mk_item(spark, tmp_path, rows):
    src_path = str(tmp_path / "src.parquet")
    spark.createDataFrame(rows, "id long, name string").write.mode("overwrite").parquet(src_path)
    # dsts unused by the export op (it publishes the *source* frame), but the
    # config shape mirrors a real item
    return EtlItemConfig(
        name="people",
        src_path=src_path,
        dsts=[
            DstConfig(
                table_path=str(tmp_path / "unused"),
                key=["id"],
                mappings=[FieldMapping(dst="id"), FieldMapping(dst="name")],
            )
        ],
    )


def _chain(tmp_path, item, table_path):
    exp = str(tmp_path / "export")
    imp = str(tmp_path / "import")
    bak = str(tmp_path / "backup")
    load = OperationConfig(
        name="ld",
        op_type="load",
        options={
            "importDir": imp,
            "tablePath": table_path,
            "key": ["id"],
            "withEventColumns": False,
            "awaitSeconds": 120,
        },
    )
    transport = OperationConfig(
        name="tr",
        op_type="transport",
        options={"exportDir": exp, "importDir": imp, "backupDir": bak},
        children=[load],
    )
    return (
        OperationConfig(
            name="exp",
            items=[item],
            op_type="export",
            options={"exportDir": exp},
            children=[transport],
        ),
        exp,
        imp,
        bak,
    )


def _state(spark, table_path):
    t = LakeTable(spark, table_path)
    return {r["id"]: r["name"] for r in t.read().collect()}


def test_export_transport_load_chain(spark, tmp_path):
    rows = [(1, "one"), (2, "two"), (3, "three")]
    item = _mk_item(spark, tmp_path, rows)
    t = LakeTable.create(spark, str(tmp_path / "dst"), DST_SCHEMA, [])
    root, exp, imp, bak = _chain(tmp_path, item, t.path)

    runner = ProcessRunner(spark, "sync", str(tmp_path / "status"))
    out = runner.run([root], run_id=0)

    assert out["exp"]["state"] == "FINISHED"
    assert out["tr"]["state"] == "FINISHED"
    assert out["ld"]["state"] == "FINISHED"
    assert _state(spark, t.path) == {1: "one", 2: "two", 3: "three"}
    # batch moved out of the export area, receipt archived in the backup area
    assert os.listdir(exp) == []
    assert any(f.endswith("._minimal.json") for f in os.listdir(bak))
    # load archives nothing driver-side; the import batch dir remains until
    # Spark's cleanSource archival (not configured here)
    assert out["tr"]["items"]["transport"]["rows"] == 3


def test_rerun_is_idempotent(spark, tmp_path):
    rows = [(1, "one"), (2, "two")]
    item = _mk_item(spark, tmp_path, rows)
    t = LakeTable.create(spark, str(tmp_path / "dst"), DST_SCHEMA, [])
    root, exp, imp, bak = _chain(tmp_path, item, t.path)

    runner = ProcessRunner(spark, "sync", str(tmp_path / "status"))
    runner.run([root], run_id=0)
    state0 = _state(spark, t.path)

    # same run id → FINISHED short-circuit, nothing re-executed
    out = runner.run([root], run_id=0)
    assert out["exp"]["state"] == "FINISHED"
    assert _state(spark, t.path) == state0

    # new run id → a fresh batch tag is exported/transported/loaded; the
    # upserts carry identical payloads so the table state must not change
    out2 = runner.run([root], run_id=1)
    assert out2["ld"]["state"] == "FINISHED"
    assert _state(spark, t.path) == state0
    # second batch landed in the import area alongside (or archived after) the first
    receipts = [f for f in os.listdir(bak) if f.endswith("._minimal.json")]
    assert len(receipts) == 2
