"""Config-driven ETL (reference's JSON-config UX): extra condition, field
mappings/constants/nulls, dimension lookup with defaults, named vectorized
transformer, multi-destination fan-out, epoch fencing through the same MERGE."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from openmrs_module_epts_etl_spark.config import (
    EtlConfig,
    TRANSFORMERS,
    register_transformer,
    run_etl_item,
)
from openmrs_module_epts_etl_spark.lake import LakeTable, identity
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@register_transformer("uppercase_status")
def _upper(df):
    return df.withColumn("status", F.upper(F.col("status")))


@pytest.fixture()
def setup(spark, tmp_path):
    src = spark.createDataFrame(
        [
            (1, 10, "a", 5.0, "open"),
            (2, 10, "b", 6.0, "closed"),
            (3, 99, "c", 7.0, "open"),  # missing dim → default
            (4, 20, "d", 8.0, "void"),  # filtered by extraCondition
        ],
        "id long, dim_id long, name string, val double, status string",
    )
    src_path = str(tmp_path / "src.parquet")
    src.write.parquet(src_path)
    dim = spark.createDataFrame(
        [(10, "north"), (20, "south")], "dim_id long, region string"
    )
    dim_path = str(tmp_path / "dim.parquet")
    dim.write.parquet(dim_path)

    dst_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("region", StringType()),
            StructField("status", StringType()),
            StructField("source_tag", StringType()),
            StructField("_lsn", LongType()),
            StructField("_origin", StringType()),
            StructField(
                "_deleted", __import__("pyspark.sql.types", fromlist=["BooleanType"]).BooleanType()
            ),
        ]
    )
    t1 = LakeTable.create(spark, str(tmp_path / "t1"), dst_schema, [])
    audit_schema = StructType(
        [StructField("id", LongType()), StructField("val", DoubleType())]
    )
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), audit_schema, [])

    cfg = {
        "processName": "demo",
        "items": [
            {
                "name": "src_to_t1_t2",
                "srcPath": src_path,
                "extraConditionForExtract": "status != 'void'",
                "transformer": "uppercase_status",
                "lookups": [
                    {
                        "path": dim_path,
                        "keys": ["dim_id"],
                        "select": ["region"],
                        "defaults": {"region": "UNKNOWN"},
                    }
                ],
                "dsts": [
                    {
                        "tablePath": t1.path,
                        "mode": "merge",
                        "key": ["id"],
                        "mappings": [
                            {"dst": "id"},
                            {"dst": "name"},
                            {"dst": "region"},
                            {"dst": "status"},
                            {"dst": "source_tag", "srcValue": "etl-demo"},
                        ],
                    },
                    {
                        "tablePath": t2.path,
                        "mode": "append",
                        "mappings": [{"dst": "id"}, {"dst": "val"}],
                    },
                ],
            }
        ],
    }
    return EtlConfig.from_json(json.dumps(cfg)), t1, t2


def test_config_etl_end_to_end(spark, setup):
    cfg, t1, t2 = setup
    item = cfg.items[0]
    out = run_etl_item(spark, item, epoch_id=0)
    rows = {r["id"]: r for r in t1.refresh().read().collect()}
    assert set(rows) == {1, 2, 3}  # 'void' filtered out
    assert rows[1]["region"] == "north"
    assert rows[3]["region"] == "UNKNOWN"  # default due inconsistency
    assert rows[2]["status"] == "CLOSED"  # transformer applied
    assert all(r["source_tag"] == "etl-demo" for r in rows.values())
    assert t2.refresh().read().count() == 3  # fan-out second destination
    assert out[t1.path].get("insert") == 3

    # replay same epoch: fenced on both destinations
    v1, v2 = t1.version, t2.version
    run_etl_item(spark, item, epoch_id=0)
    assert t1.refresh().version == v1
    # append dst is fenced too
    assert t2.refresh().read().count() == 3


def test_required_lookup_drops_rows(spark, setup, tmp_path):
    cfg, t1, t2 = setup
    item = cfg.items[0]
    item.lookups[0].required = True
    item.dsts = [item.dsts[0]]
    item.dsts[0].table_path = str(
        LakeTable.create(
            spark, str(tmp_path / "t3"), t1.schema, []
        ).path
    )
    out = run_etl_item(spark, item, epoch_id=1)
    t3 = LakeTable(spark, item.dsts[0].table_path)
    ids = {r["id"] for r in t3.read().collect()}
    assert ids == {1, 2}  # row 3 dropped (required lookup missed)


def test_config_conflict_policy_parse_and_apply(spark, setup, tmp_path):
    # conflictResolution block (README.md:304-309 analog) parses into a
    # ConflictPolicy and governs the merge across epochs
    cfg, t1, t2 = setup
    item = cfg.items[0]
    item.dsts = [item.dsts[0]]
    item.dsts[0].table_path = str(
        LakeTable.create(spark, str(tmp_path / "t_keep"), t1.schema, []).path
    )
    parsed = EtlConfig.from_json(
        json.dumps(
            {
                "processName": "p",
                "items": [
                    {
                        "name": "i",
                        "srcPath": "unused",
                        "dsts": [
                            {
                                "tablePath": "unused",
                                "conflictResolution": {"type": "KEEP_EXISTING"},
                            }
                        ],
                    }
                ],
            }
        )
    )
    assert parsed.items[0].dsts[0].policy.kind == "keep_existing"

    item.dsts[0].policy = parsed.items[0].dsts[0].policy
    run_etl_item(spark, item, epoch_id=0)
    tk = LakeTable(spark, item.dsts[0].table_path)
    before = {r["id"]: r["status"] for r in tk.read().collect()}
    # second epoch re-sends the same rows (higher synthesized lsn) — with
    # KEEP_EXISTING every matched row is kept, not overwritten
    out = run_etl_item(spark, item, epoch_id=1)
    assert out[item.dsts[0].table_path].get("policy_keep") == len(before)
    after = {r["id"]: r["status"] for r in tk.refresh().read().collect()}
    assert after == before
