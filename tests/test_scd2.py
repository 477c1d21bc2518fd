"""scd2_history edge cases the driver-oracle query can't hit: null tracked
values, single-version keys, and run collapsing."""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from openmrs_module_epts_etl_spark.operators.windows import scd2_history

SCHEMA = StructType(
    [
        StructField("k", IntegerType()),
        StructField("seq", IntegerType()),
        StructField("ts", TimestampType()),
        StructField("state", StringType()),
    ]
)


def _ts(i):
    return dt.datetime(2026, 1, 1) + dt.timedelta(minutes=i)


def test_scd2_collapses_runs_and_stitches_intervals(spark):
    rows = [
        (1, 0, _ts(0), "a"),
        (1, 1, _ts(1), "a"),  # collapses into the first
        (1, 2, _ts(2), "b"),
        (1, 3, _ts(3), "a"),  # a again — NEW version, not merged with row 0
        (2, 0, _ts(5), "x"),  # single-version key
    ]
    out = scd2_history(
        spark.createDataFrame(rows, SCHEMA),
        keys=["k"],
        order_cols=["ts", "seq"],
        tracked=["state"],
    )
    got = {(r.k, r.state, r.valid_from, r.valid_to, r.is_current) for r in out.collect()}
    assert got == {
        (1, "a", _ts(0), _ts(2), False),
        (1, "b", _ts(2), _ts(3), False),
        (1, "a", _ts(3), None, True),
        (2, "x", _ts(5), None, True),
    }


def test_scd2_null_tracked_values_collapse_null_runs(spark):
    rows = [
        (1, 0, _ts(0), None),
        (1, 1, _ts(1), None),  # null == null under eqNullSafe → collapsed
        (1, 2, _ts(2), "v"),
        (1, 3, _ts(3), None),  # null again after a real value → new version
    ]
    out = scd2_history(
        spark.createDataFrame(rows, SCHEMA),
        keys=["k"],
        order_cols=["ts", "seq"],
        tracked=["state"],
    )
    got = sorted(((r.valid_from, r.state) for r in out.collect()))
    assert got == [(_ts(0), None), (_ts(2), "v"), (_ts(3), None)]
    assert out.count() == 3
