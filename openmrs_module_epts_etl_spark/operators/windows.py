"""Window-shaped operators (SURVEY.md §2.5 — procedural logic in the
reference, windows/aggregations here)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """chooseMostRecent (api:common/model/EtlStageRecordVO.java:398-418) as a
    narrow map-side-combining max aggregation + semi join-back — see
    cdc/dedupe.py for why this beats both row_number over a key window
    (single-reducer hot keys) and max_by(struct) (SortAggregate).
    ``tie_break=True``: unlike the CDC feed, a generic input has no
    order-uniqueness contract, so ties resolve to one deterministic winner
    instead of surviving as duplicate rows."""
    from ..cdc.dedupe import dedupe_latest

    return dedupe_latest(df, key=keys, order_col=order_col, tie_break=True)


def gap_buckets(df: DataFrame, id_col: str, bucket_size: int = 1000) -> DataFrame:
    """PK sequence gap detection (DETECT_GAPES,
    api:detectgapes/processor/DetectGapesProcessor.java:41-67).

    The reference sorts the whole PK stream and diffs against the previous
    record — a global order. A global ``lag`` window is a single-reducer sort
    at scale, so instead: bucket the id space, compare per-bucket distinct
    count to the bucket's span — a bucket with count < span contains gaps.
    One shuffle, fully parallel; drill into flagged buckets if exact gap
    endpoints are needed.
    """
    b = df.select(F.col(id_col).alias("id")).withColumn(
        "bucket", F.floor(F.col("id") / bucket_size).cast("long")
    )
    per = b.groupBy("bucket").agg(
        F.countDistinct("id").alias("n_ids"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )
    return (
        per.withColumn("span", F.col("max_id") - F.col("min_id") + 1)
        .withColumn("missing_in_bucket", F.col("span") - F.col("n_ids"))
        .filter(F.col("missing_in_bucket") > 0)
        .select("bucket", "min_id", "max_id", "n_ids", "missing_in_bucket")
    )


def running_total(
    df: DataFrame, partition_cols: list[str], order_col: str, value_col: str, alias: str = "running_total"
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value_col).over(w))


def scd2_history(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    tracked: list[str],
    ts_col: str | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a changelog:
    per entity key, collapse runs of unchanged ``tracked`` attributes and
    emit one validity interval per surviving version —
    (keys.., tracked.., valid_from, valid_to, is_current).

    This is the lake-side twin of the reference's stage→apply loop when the
    destination keeps history instead of overwriting (the reference's
    chooseMostRecent keeps only the winner,
    api:common/model/EtlStageRecordVO.java:398-418 — SCD2 keeps the losers
    with their reigns). Two per-key windows, no global sort:

    1. change detection: a null-safe struct compare against ``lag`` —
       a version survives iff it differs from its predecessor;
    2. interval stitching: ``lead(valid_from)`` over the survivors.

    ``order_cols`` must be a deterministic total order per key (e.g.
    [ts, event_id]); ``ts_col`` (default: first order column) supplies the
    validity boundary values.
    """
    ts_col = ts_col or order_cols[0]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    cur = F.struct(*[F.col(c) for c in tracked])
    # row 1 of each key has lag NULL; eqNullSafe against the NULL struct is
    # false, so the first version always survives without a special branch
    changed = ~cur.eqNullSafe(F.lag(cur).over(w))
    kept = df.withColumn("__chg", changed).filter(F.col("__chg")).drop("__chg")
    w2 = Window.partitionBy(*keys).orderBy(*order_cols)
    out = kept.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w2)
    )
    return out.withColumn("is_current", F.col("valid_to").isNull()).select(
        *keys, *tracked, "valid_from", "valid_to", "is_current"
    )


def session_window_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Native session windows (``F.session_window``): per key, consecutive
    events merge into one session while each gap is at most ``gap`` (an event
    exactly ``gap`` later still merges — boundary pinned by
    test_streaming.py); the emitted window is [first_ts, last_ts + gap). The reference
    has no session concept at all (SURVEY.md §2.5 — its late-data story is
    re-running detection); ``sessionize`` above is the lag+cumsum formulation
    for when the session *id* must be joined back onto rows. This variant is
    the aggregation-shaped twin and, unlike a lag window, runs UNCHANGED on a
    streaming DataFrame (put ``withWatermark(ts_col, ...)`` upstream so Spark
    can expire session state). Physical plan: one shuffle on the key, session
    merge inside the aggregation — no per-key global sort, no Python."""
    return (
        df.groupBy(*key_cols, F.session_window(F.col(ts_col), gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            *key_cols,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap to the
    previous event exceeds ``gap_seconds``. lag + conditional cumulative sum —
    both windows partition by the key, so no global sort. The gap is computed
    with ``timestamp_diff`` directly on the stored values (never converting
    through the session timezone), so NTZ data under a DST-observing session
    tz can't shift a gap by ±3600s — microsecond precision either way."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap = F.timestamp_diff("MICROSECOND", F.lag(F.col(ts_col)).over(w), F.col(ts_col))
    df = df.withColumn(
        "__new_session", F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    )
    df = df.withColumn("session_id", F.sum("__new_session").over(w))
    return df.drop("__new_session")
