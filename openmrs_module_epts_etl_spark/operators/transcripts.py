"""Transcript-payload operators: reassembly and per-conversation rollups.

The engine's target table is a turn-level transcript store (cdc/schemas.py,
BASELINE.json input_hint: (conv_id, turn_idx, role, text, tool, ts)). The
reference's consumers read back whole conversations — the RDBMS gives them
``ORDER BY turn_idx`` for free on an indexed key (the destination tables of
api:conf/interfaces/TableConfiguration.java). On a lake table the
reassembly is an explicit operator, and it is also the operator that states
the engine's core invariant: *per-turn text equality under stable turn
ordering* — two table states are equivalent iff reassembly produces
byte-identical conversation texts.

Scale shape: one shuffle keyed by conv_id with partial (map-side) object
aggregation. Conversation size is bounded by the application (max_turns),
so unlike a general groupBy-collect the per-key state is capped — there is
no unbounded-skew failure mode, and the hot-key salting used on the merge
path is unnecessary here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reassemble_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Collapse turn rows into one row per conversation:
    (conv_id, n_turns, transcript) where ``transcript`` is
    ``role: text`` lines in strict ``turn_idx`` order.

    ``collect_list`` is order-nondeterministic across shuffle partitions, so
    the stable ordering comes from ``array_sort`` over (turn_idx, role, text)
    structs AFTER collection — sorting the bounded per-conversation array,
    never a global sort. Null texts render as '' so a null turn cannot
    erase its separator (length stays = n_turns lines).
    """
    turns = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(turn_col).alias("i"),
                F.col(role_col).alias("r"),
                F.col(text_col).alias("x"),
            )
        )
    )
    return df.groupBy(F.col(conv_col)).agg(
        F.count("*").alias("n_turns"),
        F.array_join(
            F.transform(
                turns,
                lambda s: F.concat_ws(": ", s["r"], F.coalesce(s["x"], F.lit(""))),
            ),
            sep,
        ).alias("transcript"),
    )


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation rollup a transcript pipeline filters/samples on:
    turn counts by role, tool-call count, total text chars, wall-clock
    duration. Pure one-shuffle aggregation; every measure is a native
    partial-aggregable expression (no collect, no window)."""
    return df.groupBy(F.col(conv_col)).agg(
        F.count("*").alias("n_turns"),
        F.sum(F.when(F.col(role_col) == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(F.col(role_col) == "assistant", 1).otherwise(0)).alias(
            "n_assistant"
        ),
        F.count(F.col(tool_col)).alias("n_tool_calls"),
        F.sum(F.length(F.coalesce(F.col(text_col), F.lit("")))).alias("n_chars"),
        F.max(F.col(ts_col)).alias("last_ts"),
        # timestamp_diff on the stored values — same tz-proofing as
        # operators/windows.sessionize: converting through the session
        # timezone would shift durations spanning a DST transition by ±3600s
        F.timestamp_diff(
            "MICROSECOND", F.min(F.col(ts_col)), F.max(F.col(ts_col))
        ).alias("duration_us"),
    )


def duplicate_turn_texts(
    df: DataFrame,
    role_col: str = "role",
    text_col: str = "text",
    role: str = "assistant",
    min_count: int = 2,
) -> DataFrame:
    """Exact-duplicate detection at TURN granularity: normalized assistant
    texts repeated across (or within) conversations — the transcript twin of
    document-level exact dedup (functions/dedup.exact_duplicates). Returns
    (text_hash, n_dups) for texts occurring >= min_count times. One
    map-side-combined shuffle on the 16-byte hash, never on the text."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return (
        df.filter(F.col(role_col) == role)
        .select(F.md5(norm).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") >= min_count)
    )
