"""Dead-letter quarantine: malformed change events are diverted, not fatal.

The reference documents per-record failures in ledger tables instead of
aborting the run — ``etl_record_error`` (record id, table, exception,
description; DDL api:controller/ProcessController.java:1012-1045, written via
``documentErrors``, api:model/pojo/generic/EtlOperationResultHeader.java:307)
and ``inconsistence_info`` for referential problems
(api:model/pojo/generic/AbstractDatabaseObject.java:456-574). Here the same
policy is one declarative split: a validity predicate partitions each batch
into (valid, quarantined); quarantined rows are appended to a dead-letter
lake table with the machine-readable reason and the epoch that saw them.

Both halves come from ONE pass over the batch (a cached filter and its
negation are each evaluated from the persisted batch, not recomputed), and
the quarantine append is a plain partitioned write — no per-record handling
anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..lake.partitioning import identity
from ..lake.table import LakeTable

VALID_OPS = ("I", "U", "D")


def invalid_reason(key: list[str]) -> Column:
    """NULL for valid events, else a reason code — the analog of the error
    ledger's exception description. Payload columns may be anything (schema
    evolution), but key/lsn/op structure is non-negotiable."""
    checks = [
        (F.col("lsn").isNull(), "null_lsn"),
        (F.col("lsn") < 0, "negative_lsn"),
        (F.col("op").isNull() | ~F.col("op").isin(*VALID_OPS), "bad_op"),
    ]
    for k in key:
        checks.append((F.col(k).isNull(), f"null_key_{k}"))
    out = F.lit(None).cast(StringType())
    for cond, reason in reversed(checks):
        out = F.when(cond, F.lit(reason)).otherwise(out)
    return out


def split_quarantine(
    events: DataFrame, key: list[str]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined-with-reason). Call on the raw batch before dedupe;
    a malformed event must not be allowed to win a max-lsn contest."""
    tagged = events.withColumn("_reason", invalid_reason(key))
    valid = tagged.filter(F.col("_reason").isNull()).drop("_reason")
    bad = tagged.filter(F.col("_reason").isNotNull())
    return valid, bad


def quarantine_table(spark: SparkSession, path: str, event_schema: StructType) -> LakeTable:
    """Dead-letter table: event columns + reason + epoch, partitioned by
    reason so triage scans one directory."""
    if LakeTable.exists(path):
        return LakeTable(spark, path)
    schema = StructType(
        list(event_schema.fields)
        + [StructField("_reason", StringType()), StructField("_epoch", StringType())]
    )
    return LakeTable.create(spark, path, schema, [identity("_reason", "reason")])


def append_quarantine(
    table: LakeTable,
    bad: DataFrame,
    epoch_id: int | None,
    fence_key: str | None = None,
) -> int:
    """Append quarantined rows; returns how many (0 rows → no commit, so a
    clean feed never grows the dead-letter commit log). With a fence_key the
    append is epoch-fenced like the merge: a replayed epoch (crash between
    this append and the main-table commit) cannot double-quarantine."""
    if fence_key is not None and epoch_id is not None:
        if table.epoch_already_applied(fence_key, epoch_id):
            return 0
    bad = bad.withColumn("_epoch", F.lit(str(epoch_id) if epoch_id is not None else ""))
    n = bad.count()
    if n:
        epoch = (
            {"fence_key": fence_key, "epoch_id": epoch_id} if fence_key is not None else None
        )
        table.append(bad, epoch=epoch, metrics={"applied": {"quarantined": n}})
    return n
