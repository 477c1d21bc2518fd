"""Maintenance as a process operation: compaction, layout migration, and
clustering actions chained through ProcessRunner with status files — the
control-plane face of the lake maintenance catalog."""

from __future__ import annotations

import json
import os
import random

from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from openmrs_module_epts_etl_spark.lake import LakeTable, bucket
from openmrs_module_epts_etl_spark.process import OperationConfig, ProcessRunner

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("a", IntegerType()),
        StructField("txt", StringType()),
    ]
)


def _fragmented_table(spark, path, n=6_000, appends=6):
    rng = random.Random(3)
    t = LakeTable.create(spark, path, SCHEMA, [bucket(2, "id")])
    rows = [(i, rng.randrange(1000), f"v{i}") for i in range(n)]
    per = n // appends
    for c in range(appends):
        t.append(
            spark.createDataFrame(rows[c * per : (c + 1) * per], SCHEMA).repartition(4)
        )
    return t, rows


def test_maintenance_operation_runs_action_chain(spark, tmp_path):
    t, rows = _fragmented_table(spark, str(tmp_path / "t"))
    t.evolve_partition_spec([bucket(4, "id")])
    files_before = len(t.files)

    runner = ProcessRunner(spark, "maint", str(tmp_path / "status"))
    op = OperationConfig(
        name="housekeeping",
        op_type="maintenance",
        options={
            "tablePath": t.path,
            "actions": ["migrate_layout", "compact", "rewrite_clustered"],
            "compact": {"target_rows_per_file": 2000, "min_files": 2},
            "rewrite_clustered": {"columns": ["a"], "target_rows_per_file": 2000},
        },
    )
    out = runner.run([op])
    st = out["housekeeping"]
    assert st["state"] == "FINISHED"

    t.refresh()
    # layout migrated to the evolved spec, fragmentation reduced, data intact
    assert all(f.spec_id == t.spec_id for f in t.files)
    assert len(t.files) < files_before
    got = sorted(tuple(r) for r in t.read().collect())
    assert got == sorted(rows)

    # status file records the per-action results
    with open(os.path.join(str(tmp_path / "status"), "op-housekeeping.json")) as fh:
        saved = json.load(fh)
    acts = saved["items"]["maintenance"]
    assert set(acts) == {"migrate_layout", "compact", "rewrite_clustered"}


def test_maintenance_unknown_action_fails_with_failed_status(spark, tmp_path):
    t, _ = _fragmented_table(spark, str(tmp_path / "u"), n=200, appends=1)
    runner = ProcessRunner(spark, "maint", str(tmp_path / "status"))
    op = OperationConfig(
        name="bad",
        op_type="maintenance",
        options={"tablePath": t.path, "actions": ["defragment_the_moon"]},
    )
    try:
        runner.run([op])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    with open(os.path.join(str(tmp_path / "status"), "op-bad.json")) as fh:
        assert json.load(fh)["state"] == "FAILED"
