"""Round-4 ADVICE regressions.

The medium finding: an mbucket table whose default (dedupe=False) append path
wrote a NULL-keyed feed event raw would wedge EVERY future compaction —
`_dedupe_for_table` hard-coded the clustered dedupe's `on_null='error'`
default and no public entry point could override it, so the only recovery
was manual table surgery. `on_null` is now plumbed through `append_delta`,
`compact_partitions`, `compact_latest`, and `PipelineConfig.on_null_keys`;
these tests pin the wedge (loud by default) and the recovery path (explicit
`on_null='drop'` unwedges and preserves every well-keyed row).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmrs_module_epts_etl_spark.cdc import (
    CdcPipeline,
    PipelineConfig,
    compact_latest,
    read_state,
    transcript_schema,
)
from openmrs_module_epts_etl_spark.cdc.mor import append_delta, compact_partitions
from openmrs_module_epts_etl_spark.lake import LakeTable, days, mbucket


def _feed(spark, rows):
    return spark.createDataFrame(
        rows, "op string, lsn long, origin string, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-02 03:04:05")))


def _contaminated_table(spark, tmp_path, tag):
    """mbucket table holding one NULL-keyed row via the raw append path."""
    t = LakeTable.create(
        spark, str(tmp_path / tag), transcript_schema(),
        [days("ts"), mbucket(4, "conv_id")],
    )
    good = [("U", i, "o", f"c{i % 3}", i % 5, "user", f"t{i}", None, None) for i in range(1, 20)]
    bad = [("U", 99, "o", None, 1, "user", "null-keyed", None, None)]
    append_delta(t, _feed(spark, good + bad), fence_key="f", epoch_id=0)
    return t


def test_null_key_wedges_compaction_loudly_by_default(spark, tmp_path):
    t = _contaminated_table(spark, tmp_path, "wedge")
    with pytest.raises(Exception, match="non-null"):
        compact_latest(t, fence_key="c", epoch_id=0)


def test_on_null_drop_unwedges_compaction(spark, tmp_path):
    t = _contaminated_table(spark, tmp_path, "recover")
    c = compact_latest(t, fence_key="c", epoch_id=0, on_null="drop")
    assert c is not None
    state = read_state(t.refresh())
    # every well-keyed winner survives; the NULL-keyed row is dropped
    assert state.filter(F.col("conv_id").isNull()).count() == 0
    assert state.count() == state.select("conv_id", "turn_idx").distinct().count()
    assert state.filter(F.col("text") == "t19").count() == 1


def test_on_null_drop_unwedges_selective_compaction(spark, tmp_path):
    t = _contaminated_table(spark, tmp_path, "selective")
    # min_files=1 selects every partition group, including the NULL bucket
    with pytest.raises(Exception, match="non-null"):
        compact_partitions(t, min_files=1, fence_key="s", epoch_id=0)
    c = compact_partitions(t, min_files=1, fence_key="s", epoch_id=1, on_null="drop")
    assert c is not None
    assert read_state(t.refresh()).filter(F.col("conv_id").isNull()).count() == 0


def test_pipeline_config_plumbs_on_null(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "pipe"), transcript_schema(),
        [days("ts"), mbucket(4, "conv_id")],
    )
    rows = [("U", i, "o", None if i == 7 else f"c{i % 3}", i % 5, "user", f"t{i}", None, None)
            for i in range(1, 12)]
    feed = _feed(spark, rows).withColumn("delivery_seq", F.col("lsn"))
    cfg = PipelineConfig(
        table_path=t.path, checkpoint_dir=str(tmp_path / "pipe-ck"),
        batch_size=100, mode="mor", compact_every=1, on_null_keys="drop",
    )
    CdcPipeline(spark, cfg).run(feed)
    state = read_state(t.refresh())
    assert state.filter(F.col("conv_id").isNull()).count() == 0
    assert state.filter(F.col("conv_id") == "c1").count() > 0
