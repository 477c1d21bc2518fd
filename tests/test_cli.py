"""CLI launcher (__main__.py): the ``java -jar etl.jar conf.json`` analog
(api:Main.java:12-16). End-to-end: a config FILE with operations, params and
@param-bearing extraConditionForExtract runs through main() and lands the
right rows; --status and --stop produce the control files; re-running the
same runId short-circuits."""

from __future__ import annotations

import json

import pytest
from pyspark.sql.types import BooleanType, LongType, StringType, StructField, StructType

from openmrs_module_epts_etl_spark.__main__ import main, run_config_file
from openmrs_module_epts_etl_spark.lake import LakeTable

DST_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("_lsn", LongType()),
        StructField("_origin", StringType()),
        StructField("_deleted", BooleanType()),
    ]
)


def _write_conf(spark, tmp_path):
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(1, "keep-a"), (2, "keep-b"), (3, "drop-c")], "id long, name string"
    ).write.mode("overwrite").parquet(src)
    t = LakeTable.create(spark, str(tmp_path / "dst"), DST_SCHEMA, [])
    conf = {
        "processName": "cli-proc",
        "statusDir": str(tmp_path / "status"),
        "params": {"maxId": 2},
        "items": [
            {
                "name": "load-small",
                "srcPath": src,
                # @param from the global params block (README.md:258-260)
                "extraConditionForExtract": "id <= @maxId",
                "dsts": [
                    {
                        "tablePath": t.path,
                        "key": ["id"],
                        "mappings": [{"dst": "id"}, {"dst": "name"}],
                    }
                ],
            }
        ],
        "operations": [{"name": "load", "items": ["load-small"]}],
    }
    p = tmp_path / "conf.json"
    p.write_text(json.dumps(conf))
    return str(p), t.path, str(tmp_path / "status")


def test_main_runs_config_file(spark, tmp_path, capsys):
    conf, dst, status_dir = _write_conf(spark, tmp_path)
    rc = main([conf], spark=spark)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out[conf]["load"]["state"] == "FINISHED"
    got = {r["id"]: r["name"] for r in LakeTable(spark, dst).read().collect()}
    assert got == {1: "keep-a", 2: "keep-b"}  # @maxId bound from params

    # same runId again: short-circuit, version pinned
    v = LakeTable(spark, dst).version
    assert main([conf], spark=spark) == 0
    assert LakeTable(spark, dst).version == v


def test_status_and_stop_subcommands(spark, tmp_path, capsys):
    conf, _, status_dir = _write_conf(spark, tmp_path)
    run_config_file(spark, conf)
    capsys.readouterr()
    assert main(["--status", status_dir]) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["load"]["state"] == "FINISHED"

    assert main(["--stop", status_dir]) == 0
    import os

    assert os.path.exists(os.path.join(status_dir, "stop"))


def test_unknown_item_in_operation_rejected(spark, tmp_path):
    conf, _, _ = _write_conf(spark, tmp_path)
    d = json.loads(open(conf).read())
    d["operations"][0]["items"] = ["nope"]
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(d))
    with pytest.raises(SystemExit):
        run_config_file(spark, str(bad))
