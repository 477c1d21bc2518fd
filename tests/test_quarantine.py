"""Dead-letter quarantine: malformed events divert to the error-ledger table
(≈ etl_record_error) instead of aborting or corrupting the merge."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from openmrs_module_epts_etl_spark.cdc import (
    CdcPipeline,
    PipelineConfig,
    event_schema,
    transcript_schema,
)
from openmrs_module_epts_etl_spark.cdc.quarantine import split_quarantine
from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, days


def _feed(spark):
    ts = dt.datetime(2026, 1, 1)
    rows = [
        # (lsn, op, conv_id, turn_idx, role, text, tool, ts, origin, delivery_seq)
        (1, "I", "c1", 0, "user", "hello", None, ts, "o1", 0),
        (2, "I", "c1", 1, "assistant", "hi", None, ts, "o1", 1),
        (3, "X", "c1", 2, "user", "bad-op", None, ts, "o1", 2),          # bad_op
        (4, "I", None, 3, "user", "bad-key", None, ts, "o1", 3),         # null key
        (None, "I", "c1", 4, "user", "bad-lsn", None, ts, "o1", 4),      # null lsn
        (6, "U", "c1", 0, "user", "hello!", None, ts, "o1", 5),
    ]
    from pyspark.sql.types import StructField, StructType

    # all-nullable copy: the feed contract says lsn/op/key are NOT NULL, and
    # the quarantine exists precisely for feeds that violate the contract
    schema = StructType(
        [StructField(f.name, f.dataType, True) for f in event_schema(False).fields]
    ).add("delivery_seq", "long")
    return spark.createDataFrame(rows, schema)


def test_split_quarantine_reasons(spark):
    valid, bad = split_quarantine(_feed(spark).drop("delivery_seq"), ["conv_id", "turn_idx"])
    assert valid.count() == 3
    reasons = {r["_reason"] for r in bad.select("_reason").collect()}
    assert reasons == {"bad_op", "null_key_conv_id", "null_lsn"}


def test_pipeline_quarantines_and_applies_valid(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), [days("ts"), bucket(4, "conv_id")]
    )
    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            table_path=t.path,
            checkpoint_dir=str(tmp_path / "ck"),
            batch_size=100,
            quarantine_path=str(tmp_path / "dead"),
        ),
    )
    pipe.run(_feed(spark))
    state = t.refresh().read()
    assert state.count() == 2
    assert (
        state.filter((F.col("conv_id") == "c1") & (F.col("turn_idx") == 0))
        .select("text")
        .collect()[0][0]
        == "hello!"
    )
    q = LakeTable(spark, str(tmp_path / "dead"))
    assert q.read(include_hidden=True).count() == 3
    # replay (lost checkpoint) must not double-quarantine: epoch fence holds
    import shutil

    shutil.rmtree(str(tmp_path / "ck"))
    pipe2 = CdcPipeline(
        spark,
        PipelineConfig(
            table_path=t.path,
            checkpoint_dir=str(tmp_path / "ck"),
            batch_size=100,
            quarantine_path=str(tmp_path / "dead"),
        ),
    )
    pipe2.run(_feed(spark))
    assert LakeTable(spark, str(tmp_path / "dead")).read(include_hidden=True).count() == 3
    assert t.refresh().read().count() == 2
