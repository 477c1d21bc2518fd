"""Transcript-payload queries — the engine's target data shape exercised as
driver-oracle checks.

The CDC target table holds turn-level transcript rows
(conv_id, turn_idx, role, text, tool, ts) per BASELINE.json's input_hint.
The shared testdata has no transcript parquet, so each query first DERIVES a
deterministic transcript frame from ``events`` (conv_id←user_id,
turn_idx←row_number over (ts, event_id), role alternating by turn parity,
text←event_type+props) — identically in Spark and in the DuckDB oracle —
then runs the transcript operator under test. The derivation is a pure
projection + one per-key window; the operators on top are what matters:

- ``conv_reassembly`` states the engine's core invariant (north rule:
  per-turn text equality under stable turn ordering) as a query — byte-equal
  transcripts between Spark and the oracle prove stable ordering end-to-end;
- ``conv_stats`` is the rollup a transcript pipeline filters/samples on;
- ``dup_assistant_turns`` is exact dedup at turn granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.transcripts import (
    conversation_stats,
    duplicate_turn_texts,
    reassemble_conversations,
)
from .base import t


def derived_transcripts(spark: SparkSession, sf: str) -> DataFrame:
    """events → (conv_id, turn_idx, role, text, tool, ts), deterministically.
    One per-key window (row_number over ts, event_id — event_id breaks ts
    ties, so the order is total) and pure projections; no shuffle beyond the
    window's hash partition by user."""
    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        F.concat(F.lit("c"), F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type"),
        F.col("props"),
        F.col("ts"),
    )
    return d.select(
        "conv_id",
        "turn_idx",
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.concat_ws(" ", F.col("event_type"), F.col("props")).alias("text"),
        F.when(
            F.col("event_type").isin("purchase", "signup"), F.col("event_type")
        ).alias("tool"),
        "ts",
    )


# Shared oracle CTE: the same derivation in DuckDB SQL.
_DERIVE_SQL = """
WITH tr AS (
  SELECT 'c' || user_id AS conv_id,
         (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::INT
           AS turn_idx,
         event_type, props, ts
  FROM events
), tt AS (
  SELECT conv_id, turn_idx,
         CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         concat_ws(' ', event_type, props) AS text,  -- null-skipping, like Spark's concat_ws
         CASE WHEN event_type IN ('purchase', 'signup') THEN event_type END AS tool,
         ts
  FROM tr
)
"""


def conv_reassembly(spark: SparkSession, sf: str) -> DataFrame:
    """Whole-conversation reassembly in stable turn order
    (operators/transcripts.reassemble_conversations). Byte-equality of the
    ``transcript`` column against the oracle IS the north-rule invariant."""
    return reassemble_conversations(derived_transcripts(spark, sf))


CONV_REASSEMBLY_SQL = (
    _DERIVE_SQL
    + """
SELECT conv_id, COUNT(*) AS n_turns,
       string_agg(role || ': ' || COALESCE(text, ''), chr(10) ORDER BY turn_idx)
         AS transcript  -- NULL text renders as '', same as the Spark operator
FROM tt GROUP BY conv_id
"""
)


def conv_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-conversation rollup (operators/transcripts.conversation_stats)."""
    return conversation_stats(derived_transcripts(spark, sf))


CONV_STATS_SQL = (
    _DERIVE_SQL
    + """
SELECT conv_id, COUNT(*) AS n_turns,
       SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_user,
       SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT AS n_assistant,
       COUNT(tool) AS n_tool_calls,
       SUM(length(COALESCE(text, '')))::BIGINT AS n_chars,
       MAX(ts) AS last_ts,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM tt GROUP BY conv_id
"""
)


def dup_assistant_turns(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-duplicate assistant turns across the corpus
    (operators/transcripts.duplicate_turn_texts) — md5 of the normalized
    text, portable to the oracle."""
    return duplicate_turn_texts(derived_transcripts(spark, sf), min_count=2)


DUP_ASSISTANT_TURNS_SQL = (
    _DERIVE_SQL
    + """
SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS text_hash,
       COUNT(*) AS n_dups
FROM tt WHERE role = 'assistant'
GROUP BY 1 HAVING COUNT(*) >= 2
"""
)


QUERIES = {
    "conv_reassembly": conv_reassembly,
    "conv_stats": conv_stats,
    "dup_assistant_turns": dup_assistant_turns,
}

ORACLES = {
    "conv_reassembly": CONV_REASSEMBLY_SQL,
    "conv_stats": CONV_STATS_SQL,
    "dup_assistant_turns": DUP_ASSISTANT_TURNS_SQL,
}
