"""Per-key winner selection: keep the max-lsn event per (conv_id, turn_idx).

Semantics mirror the reference's stage-area duplicate resolution —
``EtlStageRecordVO.chooseMostRecent`` keeps the most recent record per uuid
(api:common/model/EtlStageRecordVO.java:398-418, driven by
api:resolveconflictsinstagearea/processor/ResolveConflictsInStageAreaProcessor.java:26-66)
— with lsn as the total order instead of date_changed/date_voided, so
delete-then-reinsert inside one batch keeps the *last op*, never collapsing
D+I into a no-op (SURVEY.md §7.3).

Skew: the primary implementation is ``max_by`` aggregation, which Spark
executes with **map-side partial aggregation** — a hot conv_id's events are
pre-reduced inside every input partition before the shuffle, so a key carrying
30% of the feed contributes at most one row per map task to the exchange.
That is strictly better than the window-function formulation
(row_number over partitionBy(key)), which shuffles every event of the hot key
to one reducer. An explicit two-stage salted variant is provided for the case
where the *number of distinct keys* under a hot conv also skews (one conv_id
with millions of turn_idx values still distributes fine — key is the pair —
so salting is rarely needed; it exists for completeness and benchmarking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import TRANSCRIPT_KEY


def dedupe_latest(events: DataFrame, key: list[str] | None = None, order_col: str = "lsn") -> DataFrame:
    """One row per key: the event with the maximal ``order_col``.

    Implemented as max_by(struct(*), lsn) → partial-agg friendly, one shuffle,
    no sort. Output columns = input columns.
    """
    key = key or TRANSCRIPT_KEY
    cols = events.columns
    winner = events.groupBy(*key).agg(
        F.max_by(F.struct(*[F.col(c) for c in cols]), F.col(order_col)).alias("__w")
    )
    return winner.select(*[F.col(f"__w.{c}").alias(c) for c in cols])


def dedupe_latest_salted(
    events: DataFrame,
    key: list[str] | None = None,
    order_col: str = "lsn",
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage salted max_by: stage 1 reduces (key, salt) groups, stage 2
    reduces per key. Equivalent result; use when a single composite key value
    dominates the batch (e.g. one turn updated millions of times per batch).
    The salt is derived from lsn, so distribution is uniform and deterministic.
    """
    key = key or TRANSCRIPT_KEY
    cols = events.columns
    salted = events.withColumn("__salt", F.pmod(F.col(order_col), F.lit(salt_buckets)).cast("int"))
    stage1 = salted.groupBy(*key, "__salt").agg(
        F.max_by(F.struct(*[F.col(c) for c in cols]), F.col(order_col)).alias("__w")
    )
    stage2 = stage1.groupBy(*key).agg(
        F.max_by(F.col("__w"), F.col(f"__w.{order_col}")).alias("__w")
    )
    return stage2.select(*[F.col(f"__w.{c}").alias(c) for c in cols])
