from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, days


SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(spark, n, day="2026-01-01"):
    import datetime as dt

    base = dt.datetime.fromisoformat(f"{day} 00:00:00")
    return [
        (f"conv-{i % 5}", i, f"text-{i}", base + dt.timedelta(seconds=i)) for i in range(n)
    ]


def test_create_read_empty(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, [days("ts"), bucket(4, "conv_id")])
    assert t.version == 0
    assert t.read().count() == 0
    assert t.read().schema == SCHEMA


def test_append_and_snapshot_isolation(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, [days("ts"), bucket(4, "conv_id")])
    t.append(_df(spark, _rows(spark, 10)))
    assert t.version == 1
    assert t.read().count() == 10
    t.append(_df(spark, _rows(spark, 5, day="2026-01-02")))
    assert t.read().count() == 15
    # time travel: version 1 still sees 10 rows
    t1 = LakeTable(spark, t.path, version=1)
    assert t1.read().count() == 10


def test_partition_layout_and_pruning(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, [days("ts"), bucket(4, "conv_id")])
    t.append(_df(spark, _rows(spark, 20, day="2026-01-01")))
    t.append(_df(spark, _rows(spark, 20, day="2026-01-02")))
    days_seen = {f.partition["ts_day"] for f in t.files}
    assert days_seen == {"2026-01-01", "2026-01-02"}
    pruned = t.read(partition_filter=lambda p: p["ts_day"] == "2026-01-01")
    assert pruned.count() == 20
    # partition values are derivable from data columns (hidden partitioning)
    assert pruned.select(F.date_format("ts", "yyyy-MM-dd").alias("d")).distinct().collect()[0][
        "d"
    ] == "2026-01-01"


def test_additive_schema_evolution(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, [days("ts")])
    t.append(_df(spark, _rows(spark, 5)))
    wider = StructType(SCHEMA.fields + [StructField("meta_tokens", IntegerType())])
    new_rows = [(f"conv-x", i, f"t{i}", None, 42) for i in range(3)]
    df2 = spark.createDataFrame(
        [(c, i, s, __import__("datetime").datetime(2026, 1, 3), m) for c, i, s, _, m in new_rows],
        wider,
    )
    evolved = t.evolved_schema(df2.schema)
    assert [f.name for f in evolved.fields][-1] == "meta_tokens"
    t.append(df2)
    out = t.read()
    assert "meta_tokens" in out.columns
    assert out.filter(F.col("meta_tokens").isNull()).count() == 5  # old files → null
    assert out.filter(F.col("meta_tokens") == 42).count() == 3


def test_non_additive_evolution_rejected(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, [])
    bad = StructType(
        [StructField("conv_id", IntegerType())]  # type change
    )
    with pytest.raises(ValueError, match="non-additive"):
        t.evolved_schema(bad)


def test_epoch_fencing(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, [])
    t.append(_df(spark, _rows(spark, 3)), epoch={"fence_key": "run1", "epoch_id": 7})
    assert t.epoch_already_applied("run1", 7)
    assert not t.epoch_already_applied("run1", 8)
    assert not t.epoch_already_applied("run2", 7)


def test_commit_conflict_occ_rebase(spark, tmp_path):
    """Two handles racing to publish the same next version: the loser's
    commit must REBASE onto the winner (OCC, round 2 — the single-writer
    raise was replaced) and both writers' rows must land; the raw version
    claim itself stays mutually exclusive (link-based CAS,
    test_occ.py covers the conflict taxonomy)."""
    path = str(tmp_path / "t")
    LakeTable.create(spark, path, SCHEMA, [])
    a = LakeTable(spark, path)
    b = LakeTable(spark, path)  # stale handle at the same base version
    a.append(_df(spark, _rows(spark, 3)))
    c = b.append(_df(spark, _rows(spark, 2)))
    assert c.version == 2 and c.parent == 1  # rebased, not clobbered
    assert a.refresh().read().count() == 5
    assert b.read().count() == 5


def test_read_incremental_appends(spark, tmp_path):
    """Incremental scan returns exactly the rows of files added between two
    retained snapshots (append-style commits → exact row granularity)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, [])
    v0 = t.version
    t.append(_df(spark, _rows(spark, 4)))
    v1 = t.version
    t.append(_df(spark, _rows(spark, 6, day="2026-01-02")))
    t.append(_df(spark, _rows(spark, 2, day="2026-01-03")))
    v3 = t.version
    assert t.read_incremental(v0, v1).count() == 4
    assert t.read_incremental(v1).count() == 8       # v1 → current
    assert t.read_incremental(v1, v3).count() == 8
    assert t.read_incremental(v3, v3).count() == 0   # empty range
    with pytest.raises(ValueError):
        t.read_incremental(v3, v1)


def test_manifest_stats_and_data_skipping(spark, tmp_path):
    import datetime as dt

    from openmrs_module_epts_etl_spark.lake import file_may_match

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, [days("ts")])
    # two disjoint days → two files with disjoint turn_idx and ts ranges
    t.append(_df(spark, _rows(spark, 50, day="2026-01-01")))
    rows2 = [
        (f"conv-{i % 5}", 1000 + i, f"late-{i}",
         dt.datetime(2026, 2, 1) + dt.timedelta(seconds=i))
        for i in range(50)
    ]
    t = t.refresh()
    t.append(_df(spark, rows2))
    t = t.refresh()
    files = t.files
    assert len(files) >= 2
    # every file carries min/max stats for the scalar columns
    for f in files:
        assert f.stats and "turn_idx" in f.stats and "ts" in f.stats and "conv_id" in f.stats
    # a predicate only the second batch satisfies skips every first-day file
    where = [("turn_idx", ">=", 1000)]
    kept = [f for f in files if file_may_match(f, where)]
    assert 0 < len(kept) < len(files)
    got = t.read(where=where)
    assert got.count() == 50
    assert {r.text for r in got.limit(3).collect()} <= {f"late-{i}" for i in range(50)}
    # timestamp predicates skip via ISO-encoded stats
    ts_where = [("ts", ">=", dt.datetime(2026, 2, 1))]
    assert 0 < len([f for f in files if file_may_match(f, ts_where)]) < len(files)
    assert t.read(where=ts_where).count() == 50
    # exact semantics: where result == full-scan filter result
    full = t.read().filter(F.col("turn_idx") >= 1000).count()
    assert full == 50
    # unknown column / bad op rejected
    with pytest.raises(ValueError):
        t.read(where=[("nope", "=", 1)])
    with pytest.raises(ValueError):
        t.read(where=[("turn_idx", "!=", 1)])


def test_stats_missing_is_conservative(spark, tmp_path):
    from openmrs_module_epts_etl_spark.lake import file_may_match
    from openmrs_module_epts_etl_spark.lake.table import DataFile

    legacy = DataFile(path="x", partition={}, rows=1)  # pre-stats manifest
    assert file_may_match(legacy, [("turn_idx", "=", 10**9)])
    partial = DataFile(path="x", partition={}, rows=1, stats={"a": [0, 5]})
    assert file_may_match(partial, [("b", "=", 99)])  # unknown col → keep
    assert not file_may_match(partial, [("a", ">", 5)])
    assert file_may_match(partial, [("a", ">=", 5)])
    # incomparable types (schema drift) → keep
    assert file_may_match(partial, [("a", "=", "zzz")])


def test_vacuum_skips_scan_without_tombstones(spark, tmp_path):
    from openmrs_module_epts_etl_spark.cdc import merge_into, vacuum_tombstones
    from openmrs_module_epts_etl_spark.cdc.schemas import EVENT_SCHEMA
    from openmrs_module_epts_etl_spark.cdc import transcript_schema
    import datetime as dt

    t = LakeTable.create(
        spark, str(tmp_path / "t"), transcript_schema(), [days("ts"), bucket(4, "conv_id")]
    )
    T = dt.datetime(2026, 3, 1)
    ins = [(i, "I", f"c{i%3}", i, "user", f"t{i}", None, T, "o") for i in range(1, 20)]
    merge_into(t, spark.createDataFrame(ins, EVENT_SCHEMA))
    t = t.refresh()
    # no tombstones anywhere → stats prove it → no rewrite commit
    assert vacuum_tombstones(t, min_lsn_keep=10**9) is None
    # delete one key, vacuum below horizon → rewrites exactly the dirty file
    merge_into(t, spark.createDataFrame([(50, "D", "c1", 1, None, None, None, T, "o")], EVENT_SCHEMA))
    t = t.refresh()
    c = vacuum_tombstones(t, min_lsn_keep=10**9)
    assert c is not None
    t = t.refresh()
    assert vacuum_tombstones(t, min_lsn_keep=10**9) is None  # now clean again
