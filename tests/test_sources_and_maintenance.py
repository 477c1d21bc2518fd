"""File transport sinks/sources (export → load round-trip) + table
maintenance (compaction)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pyspark.sql.functions as F
import pytest

from openmrs_module_epts_etl_spark.cdc import compact
from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, days
from openmrs_module_epts_etl_spark.sources import (
    csv_export,
    json_export,
    json_load_stream,
    sql_dump_export,
)
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _df(spark, n=20):
    base = dt.datetime(2026, 1, 1)
    rows = [
        (f"conv-{i % 3}", i, f"text-{i}", base + dt.timedelta(seconds=i)) for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_json_export_manifest_and_atomicity(spark, tmp_path):
    out = str(tmp_path / "export")
    m = json_export(_df(spark), out, "b0001")
    assert m["rows"] == 20 and m["files"]
    final = os.path.join(out, "b0001")
    assert os.path.isdir(final)
    with open(os.path.join(final, "_minimal.json")) as fh:
        assert json.load(fh)["rows"] == 20
    # no .tmp leftovers; re-export of the same batch refuses
    assert not [d for d in os.listdir(out) if ".tmp-" in d]
    with pytest.raises(FileExistsError):
        json_export(_df(spark), out, "b0001")


def test_json_export_load_roundtrip_stream(spark, tmp_path):
    out = str(tmp_path / "export")
    json_export(_df(spark, 15), out, "b0001")
    json_export(_df(spark, 25).filter(F.col("turn_idx") >= 15), out, "b0002")
    got_rows = []

    reader = json_load_stream(
        spark, out, SCHEMA, str(tmp_path / "ck"), archive_dir=str(tmp_path / "done")
    )
    q = (
        reader.writeStream.foreachBatch(
            lambda df, _eid: got_rows.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sorted(r["turn_idx"] for r in got_rows) == list(range(25))


def test_csv_and_sql_dump(spark, tmp_path):
    df = _df(spark, 10)
    csv_export(df, str(tmp_path / "csv"))
    back = spark.read.option("header", "true").csv(str(tmp_path / "csv"))
    assert back.count() == 10

    sql_dump_export(df.select("conv_id", "turn_idx"), "transcripts", str(tmp_path / "dump"), 4)
    stmts = (
        spark.read.text(str(tmp_path / "dump"), wholetext=True)
        .agg(F.concat_ws("\n", F.collect_list("value")))
        .collect()[0][0]
    )
    assert "INSERT INTO transcripts (conv_id, turn_idx) VALUES" in stmts
    assert stmts.count("('conv-") == 10


def test_compact_bin_packs_small_files(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, [days("ts"), bucket(2, "conv_id")]
    )
    # 6 tiny appends → many small files per partition
    for i in range(6):
        t.append(_df(spark, 10))
    before = len(t.files)
    rows_before = t.read(include_hidden=True).count()
    c = compact(t, target_rows_per_file=1_000_000, min_files=3)
    assert c is not None
    after = len(t.refresh().files)
    assert after < before
    assert t.read(include_hidden=True).count() == rows_before
    # idempotent once packed
    assert compact(t, target_rows_per_file=1_000_000, min_files=3) is None


def test_expire_snapshots_keeps_fences_and_live_files(spark, tmp_path):
    """expire_snapshots deletes old snapshots + their exclusive files but
    (a) the current state stays readable and (b) epoch fences recorded on
    expired commits still make replays no-ops (sidecar)."""
    from openmrs_module_epts_etl_spark.lake import LakeTable, expire_snapshots

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, [])
    for e in range(5):
        t.append(_df(spark, 4), epoch={"fence_key": "run", "epoch_id": e})
    before_rows = t.read().count()
    stats = expire_snapshots(t, keep_last=2)
    assert stats["expired_snapshots"] == 4  # v0(create)+v1..v3 expired, v4/v5 kept
    t2 = LakeTable(spark, t.path)
    assert t2.read().count() == before_rows
    # fences from expired commits survive
    for e in range(5):
        assert t2.epoch_already_applied("run", e), e
    # only 2 snapshot files remain (plus the fence sidecar)
    import os
    names = os.listdir(os.path.join(t.path, "_commits"))
    assert len([n for n in names if n.endswith(".json") and not n.startswith("_")]) == 2


def test_remove_orphan_files(spark, tmp_path):
    """A data directory written but never committed (crash between write and
    commit) is swept once past the grace window; referenced files survive."""
    import os

    from openmrs_module_epts_etl_spark.lake import LakeTable, remove_orphan_files

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, [])
    t.append(_df(spark, 6))
    # simulate the crash: files written, commit never happened
    orphan_files, _rel = t.write_data_files(_df(spark, 3))
    assert orphan_files
    n_before = t.read().count()
    assert remove_orphan_files(t, grace_seconds=1e9) == 0  # inside grace → kept
    removed = remove_orphan_files(t, grace_seconds=0.0)
    assert removed >= len(orphan_files)
    t2 = LakeTable(spark, t.path)
    assert t2.read().count() == n_before  # committed data intact


def test_transport_batches(spark, tmp_path):
    from openmrs_module_epts_etl_spark.sources.files import transport_batches

    df = spark.range(5).select(F.col("id"))
    export = str(tmp_path / "export")
    imp = str(tmp_path / "import")
    bkp = str(tmp_path / "bkp")
    m = json_export(df, export, "b1")
    assert m["rows"] == 5  # Observation-counted on the write job itself
    moved = transport_batches(export, imp, bkp)
    assert len(moved) == 1 and moved[0]["rows"] == 5
    assert os.path.isdir(os.path.join(imp, "b1"))
    assert not os.path.exists(os.path.join(export, "b1"))
    assert os.path.exists(os.path.join(bkp, "b1._minimal.json"))
    # a re-exported batch with the same tag must not clobber the import area
    json_export(df, export, "b1")
    with pytest.raises(FileExistsError):
        transport_batches(export, imp)
