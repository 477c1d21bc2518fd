"""Multi-writer commit safety (VERDICT r01 item 6): OCC rebase-and-retry on
version collisions, atomic version claim, fence detection across writers,
and concurrent parallel-mode process items sharing one destination."""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from openmrs_module_epts_etl_spark.cdc import merge_into
from openmrs_module_epts_etl_spark.cdc.schemas import transcript_schema
from openmrs_module_epts_etl_spark.config import EtlConfig
from openmrs_module_epts_etl_spark.lake import LakeTable, bucket
from openmrs_module_epts_etl_spark.lake.table import CommitConflict, EpochAlreadyApplied
from openmrs_module_epts_etl_spark.process import OperationConfig, ProcessRunner


def _feed(spark, conv: str, n: int, lsn0: int):
    return spark.range(n).select(
        F.lit(conv).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
        (F.col("id") + lsn0).alias("lsn"),
        F.lit("I").alias("op"),
        F.lit("occ-test").alias("origin"),
    )


def test_concurrent_merges_both_land(spark, tmp_path):
    path = str(tmp_path / "t")
    LakeTable.create(spark, path, transcript_schema(), [bucket(4, "conv_id")])

    def run(i):
        # each writer holds its OWN handle (stale relative to the other)
        table = LakeTable(spark, path)
        return merge_into(
            table, _feed(spark, f"conv-{i}", 200, i * 1000),
            fence_key=f"w{i}", epoch_id=0,
        )

    with ThreadPoolExecutor(max_workers=2) as ex:
        res = list(ex.map(run, [0, 1]))
    final = LakeTable(spark, path)
    assert final.version == 2  # both commits landed, serialized by OCC
    got = final.read().groupBy("conv_id").count().collect()
    assert {r["conv_id"]: r["count"] for r in got} == {"conv-0": 200, "conv-1": 200}
    assert all(r.commit is not None for r in res)


def test_stale_handle_commit_rebases(spark, tmp_path):
    path = str(tmp_path / "t2")
    LakeTable.create(spark, path, transcript_schema(), [])
    a = LakeTable(spark, path)
    b = LakeTable(spark, path)  # stale after a's commit
    a.append(_feed(spark, "a", 10, 0))
    c = b.append(_feed(spark, "b", 10, 100))  # must rebase onto v1, not clash
    assert c.version == 2
    final = LakeTable(spark, path)
    assert final.read().count() == 20
    # the rebased commit kept a's files
    assert {f.path for f in a._commit.files} <= {f.path for f in final.files}


def test_concurrent_same_fence_detected(spark, tmp_path):
    path = str(tmp_path / "t3")
    LakeTable.create(spark, path, transcript_schema(), [])
    a = LakeTable(spark, path)
    b = LakeTable(spark, path)
    a.append(_feed(spark, "a", 5, 0), epoch={"fence_key": "f", "epoch_id": 7})
    # b raced the same epoch and lost: its rebase must see the fence and
    # refuse to double-apply
    with pytest.raises(EpochAlreadyApplied):
        b.append(_feed(spark, "a", 5, 0), epoch={"fence_key": "f", "epoch_id": 7})


def test_conflicting_file_rewrite_refused(spark, tmp_path):
    path = str(tmp_path / "t4")
    LakeTable.create(spark, path, transcript_schema(), [])
    seed = LakeTable(spark, path)
    seed.append(_feed(spark, "a", 10, 0))
    target = seed.files[0].path
    a = LakeTable(spark, path)
    b = LakeTable(spark, path)
    af, _ = a.write_data_files(_feed(spark, "a", 1, 100))
    bf, _ = b.write_data_files(_feed(spark, "a", 1, 200))
    a.commit(af, remove_paths={target})
    with pytest.raises(CommitConflict):
        b.commit(bf, remove_paths={target})  # same file already rewritten


def test_parallel_process_items_shared_destination(spark, tmp_path):
    dst = str(tmp_path / "shared")
    LakeTable.create(spark, dst, transcript_schema(), [bucket(4, "conv_id")])
    items = []
    for i in range(3):
        src = _feed(spark, f"conv-{i}", 100, i * 1000)
        p = str(tmp_path / f"src{i}.parquet")
        src.write.parquet(p)
        items.append({
            "name": f"item{i}", "srcPath": p,
            "dsts": [{"tablePath": dst, "mode": "merge", "key": ["conv_id", "turn_idx"]}],
        })
    cfg = EtlConfig.from_json(json.dumps({"processName": "occ", "items": items}))
    op = OperationConfig(name="op", items=cfg.items, processing_mode="parallel",
                         max_item_threads=3)
    runner = ProcessRunner(spark, "occ", str(tmp_path / "status"))
    out = runner.run([op], run_id=0)
    assert out["op"]["state"] == "FINISHED"
    final = LakeTable(spark, dst)
    counts = {r["conv_id"]: r["count"]
              for r in final.read().groupBy("conv_id").count().collect()}
    assert counts == {"conv-0": 100, "conv-1": 100, "conv-2": 100}
