"""Transcript reassembly/rollup edge cases: out-of-order input, null text,
and turn-level dedup normalization."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from openmrs_module_epts_etl_spark.operators.transcripts import (
    conversation_stats,
    duplicate_turn_texts,
    reassemble_conversations,
)

SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _ts(i):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i)


def _df(spark):
    rows = [
        # deliberately NOT in turn order — reassembly must impose it
        ("c1", 2, "user", "and then?", None, _ts(20)),
        ("c1", 0, "user", "hello", None, _ts(0)),
        ("c1", 3, "assistant", None, "search", _ts(30)),  # null text turn
        ("c1", 1, "assistant", "hi there", None, _ts(10)),
        ("c2", 0, "user", "hello", None, _ts(5)),
        ("c2", 1, "assistant", "hi there", None, _ts(6)),
    ]
    # repartition to scatter turns across shuffle partitions
    return spark.createDataFrame(rows, SCHEMA).repartition(7)


def test_reassembly_is_turn_ordered_and_null_safe(spark):
    out = {r.conv_id: r for r in reassemble_conversations(_df(spark)).collect()}
    assert out["c1"].n_turns == 4
    assert out["c1"].transcript == (
        "user: hello\nassistant: hi there\nuser: and then?\nassistant: "
    )
    assert out["c2"].transcript == "user: hello\nassistant: hi there"


def test_conversation_stats(spark):
    out = {r.conv_id: r for r in conversation_stats(_df(spark)).collect()}
    c1 = out["c1"]
    assert (c1.n_turns, c1.n_user, c1.n_assistant, c1.n_tool_calls) == (4, 2, 2, 1)
    assert c1.n_chars == len("hello") + len("hi there") + len("and then?") + 0
    assert c1.duration_us == 30 * 1_000_000
    assert out["c2"].duration_us == 1 * 1_000_000


def test_duplicate_turn_texts_normalizes(spark):
    rows = [
        ("c1", 0, "assistant", "Hello   World", None, _ts(0)),
        ("c2", 0, "assistant", "  hello world ", None, _ts(1)),  # same after norm
        ("c3", 0, "assistant", "unique", None, _ts(2)),
        ("c4", 0, "user", "Hello   World", None, _ts(3)),  # wrong role — excluded
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = duplicate_turn_texts(df, min_count=2).collect()
    assert len(out) == 1
    assert out[0].n_dups == 2
