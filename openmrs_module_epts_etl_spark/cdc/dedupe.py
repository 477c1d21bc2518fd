"""Per-key winner selection: keep the max-lsn event per (conv_id, turn_idx).

Semantics mirror the reference's stage-area duplicate resolution —
``EtlStageRecordVO.chooseMostRecent`` keeps the most recent record per uuid
(api:common/model/EtlStageRecordVO.java:398-418, driven by
api:resolveconflictsinstagearea/processor/ResolveConflictsInStageAreaProcessor.java:26-66)
— with lsn as the total order instead of date_changed/date_voided, so
delete-then-reinsert inside one batch keeps the *last op*, never collapsing
D+I into a no-op (SURVEY.md §7.3).

Physical strategy (measured, 4M rows / 8 cores, see BENCH.md):

- ``max_by(struct(*cols), lsn)`` — the obvious one-pass form — compiles to
  **SortAggregate** because the struct-valued aggregation buffer disqualifies
  Tungsten hash aggregation: Spark sorts the full payload on BOTH sides of
  the exchange (~9 s, and it barely scales 2→8 cores because the sorts
  dominate).
- The implementation here is **narrow-agg + join-back**: ``max(lsn)`` per key
  is a pure HashAggregate over ~24-byte rows with map-side partial
  aggregation (a hot conv_id pre-reduces inside every map task), then a
  ``left_semi`` join on (key, lsn) re-attaches the payload (~2-3 s, scales).
  The build side is winner keys only; ``shuffle_hash`` keeps it scalable when
  winners exceed broadcast size, and AQE still demotes to broadcast-hash when
  the winner set is small. The payload is never sorted and never aggregated.

Invariant: ``order_col`` (lsn = binlog position) is unique per key occurrence;
a (key, lsn) duplicate would survive the semi-join as two rows. The feed
contract guarantees lsn uniqueness (exactly-once fences keep re-delivered
epochs out), matching the reference's assumption that stage-area records have
distinct ids (api:common/model/EtlStageRecordVO.java:398-418).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import TRANSCRIPT_KEY


def dedupe_latest(
    events: DataFrame,
    key: list[str] | None = None,
    order_col: str = "lsn",
    tie_break: bool = False,
) -> DataFrame:
    """One row per key: the event with the maximal ``order_col``.

    Narrow hash-aggregation (max over the order column alone — map-side
    combined, skew-safe) + null-safe left-semi join-back on (key, order_col)
    to re-attach the payload. The payload is never sorted, never shuffled
    with an aggregation buffer, and the source is scanned twice — cheap for
    every caller here (persisted feed slice, parquet files, or foreachBatch
    frame). Output columns = input columns.

    ``tie_break=True`` additionally resolves (key, order_col) TIES to one
    deterministic winner: content-distinct tie rows are discriminated by a
    min content hash (a pure row function — stable across branch
    recomputation, unlike monotonically_increasing_id, whose per-partition
    numbering shifts when a shuffled branch is recomputed and would make the
    build and probe sides disagree), and byte-identical duplicates (the
    realistic case: duplicate delivery) collapse under a final ``distinct``
    — group-by-all-columns HashAggregate, still sort-free, over the already
    winner-sized output. Measured ~2× the join work of the plain path. The
    CDC merge path leaves it off because the feed contract guarantees lsn
    uniqueness per key and merge_into *detects* violations in its hint
    aggregation, re-running with tie_break=True only when one is present;
    the generic ``latest_per_key`` operator keeps it on (no uniqueness
    contract there).
    """
    key = key or TRANSCRIPT_KEY
    cols = events.columns
    winners = events.groupBy(*key).agg(F.max(order_col).alias(order_col))
    out = _join_back(events, winners, key, order_col)
    if tie_break:
        # map-typed columns are unhashable/un-distinct-able in Spark — hash
        # their to_json image instead (per-row deterministic: the map's entry
        # order is a function of how the row was computed, which is the same
        # on both sides of the self-join), and collapse byte-identical
        # duplicates by (key, order, hash) rather than a full-row distinct,
        # which would also choke on maps. Hash collisions conflating two
        # genuinely different tie rows are 2^-64 — the same exposure any
        # hash-based shuffle already carries.
        def _hashable(c: str):
            return (
                F.to_json(F.col(c)) if _has_map(events.schema[c].dataType) else F.col(c)
            )

        # temp hash column name salted against the input's own columns — a
        # user column literally named "__h" must not be clobbered
        h = "__h"
        while h in cols:
            h += "_"
        out = out.withColumn(h, F.xxhash64(*[_hashable(c) for c in cols]))
        ties = out.groupBy(*key, order_col).agg(F.min(h).alias(h))
        out = _join_back(out, ties, [*key, order_col], h).dropDuplicates(
            [*key, order_col, h]
        )
    return out.select(*cols)


def _has_map(dt) -> bool:
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _has_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_has_map(f.dataType) for f in dt.fields)
    return False


def _join_back(events: DataFrame, winners: DataFrame, key: list[str], order_col: str) -> DataFrame:
    """Null-safe left-semi join-back: ``eqNullSafe`` on every join column —
    groupBy keeps a NULL-key group (SQL semantics), so the join-back must
    too; plain equality would silently drop it (latest_per_key exposes this
    operator generically, where NULL keys/order values are legal). Null-safe
    keys cost nothing: same ShuffledHashJoin, same exchanges (measured)."""
    w = winners.hint("shuffle_hash")
    cond = None
    for c in [*key, order_col]:
        e = events[c].eqNullSafe(w[c])
        cond = e if cond is None else cond & e
    return events.join(w, cond, "left_semi")


def dedupe_latest_clustered(
    events: DataFrame,
    key: list[str] | None = None,
    order_col: str = "lsn",
    cluster_col: str | None = None,
    num_partitions: int | None = None,
    on_null: str = "error",
) -> DataFrame:
    """``dedupe_latest`` arranged around ONE payload exchange.

    The plain path exchanges the payload on (key, order) for the semi-join
    and leaves the output partitioned by a key the partitioned write cannot
    use, so a caller that writes the winners pays a second payload exchange
    (write clustering) plus the narrow winner-aggregation exchange. Here the
    payload is repartitioned ONCE on ``cluster_col`` (a prefix of ``key`` —
    conv_id for transcripts), and Catalyst keeps everything downstream
    exchange-free: HashPartitioning(cluster_col) satisfies the aggregation's
    ClusteredDistribution(key) because the partitioning expressions are a
    subset of the grouping keys, the semi-join's both sides carry the
    identical partitioning (the winner side inherits it through the
    partition-local aggregate), and the output still clusters by
    cluster_col — so a table whose spec buckets by ``mbucket(n, cluster_col)``
    can write it with ``arrange=False`` and ZERO further exchange as long as
    ``num_partitions`` is a multiple of n (task id ``pmod(hash(c), N)``
    determines bucket ``pmod(hash(c), n)``; lake/partitioning.py:mbucket).

    Use when the caller controls the write layout (MoR compaction,
    deduped-epoch appends). Skew note: after winner selection a hot conv_id
    is at most one row per turn, so the post-dedupe write skew the plain
    path's REBALANCE guards against is structurally absent; the PRE-dedupe
    hot-conv concentration (one task aggregating a 30%-hot conversation) is
    bounded by the narrow aggregation's map-side combine, same as the plain
    path.

    CONTRACT (unlike the generic ``dedupe_latest``): key and order columns
    must be non-NULL — the join-back here uses plain equality, because
    eqNullSafe keys compile to ``coalesce(k, d), isnull(k)`` expression
    pairs and Catalyst then requires clustering on THOSE, which a
    repartition on the raw column can never satisfy (every exchange comes
    back). The CDC feed contract already guarantees non-null (conv_id,
    turn_idx, lsn). The contract is ENFORCED, not assumed: under the default
    ``on_null="error"`` a NULL key/order value raises at execution time
    (``raise_error`` folded into the order column, so it rides the existing
    scan — no extra job, no extra shuffle, and column pruning cannot drop it
    because the order column feeds both the winner aggregation and the
    join-back). A caller that has pre-filtered NULLs and wants them dropped
    must say so explicitly with ``on_null="drop"``; callers with legitimate
    NULL keys want ``dedupe_latest``."""
    key = key or TRANSCRIPT_KEY
    cluster_col = cluster_col or key[0]
    assert cluster_col in key, "cluster_col must be part of the key"
    if on_null not in ("error", "drop"):
        raise ValueError(f"on_null must be 'error' or 'drop', got {on_null!r}")
    if on_null == "error":
        any_null = None
        for c in [*key, order_col]:
            e = F.col(c).isNull()
            any_null = e if any_null is None else any_null | e
        msg = (
            "dedupe_latest_clustered: NULL in key/order column "
            f"({', '.join([*key, order_col])}) violates the non-null "
            "feed contract; use dedupe_latest for NULL-keyed data "
            "or pass on_null='drop' after pre-filtering"
        )
        # EVERY key/order column is guard-wrapped, not just the order column:
        # the semi-join infers IsNotNull on its (plain-equality) join keys and
        # pushes those filters BENEATH this projection, so a raw key column
        # would let the inferred filter drop the NULL row before any guarded
        # expression runs (observed in the physical plan). With each join key
        # an alias of the CASE guard, the pushed-down filter itself must
        # evaluate the guard — the raise fires on the first conjunct.
        events = events.select(
            *[
                F.when(
                    any_null,
                    F.raise_error(F.lit(msg)).cast(events.schema[c].dataType),
                )
                .otherwise(F.col(c))
                .alias(c)
                if c in (*key, order_col)
                else F.col(c)
                for c in events.columns
            ]
        )
    cols = events.columns

    def _cluster(df: DataFrame) -> DataFrame:
        if num_partitions:
            return df.repartition(num_partitions, F.col(cluster_col))
        return df.repartition(F.col(cluster_col))

    # The narrow branch repartitions a PRE-PROJECTED (key, order) frame
    # rather than sharing the payload exchange: exchange reuse would make the
    # aggregation re-READ the full-width shuffle (no column pruning through a
    # reused exchange), doubling shuffle-read bytes to save a ~24-byte/row
    # map side. Both exchanges hash the same expression to the same count, so
    # the join and the downstream write stay exchange-free either way.
    clustered = _cluster(events)
    winners = (
        _cluster(events.select(*key, order_col))
        .groupBy(*key)
        .agg(F.max(order_col).alias(order_col))
    )
    w = winners.hint("shuffle_hash")
    cond = None
    for c in [*key, order_col]:
        e = clustered[c] == w[c]
        cond = e if cond is None else cond & e
    return clustered.join(w, cond, "left_semi").select(*cols)


def dedupe_latest_salted(
    events: DataFrame,
    key: list[str] | None = None,
    order_col: str = "lsn",
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage salted variant of the narrow winner aggregation: stage 1
    takes max(order_col) per (key, salt), stage 2 per key, then the same
    left-semi join-back re-attaches the payload. Equivalent result; use when
    a single composite key value dominates the batch so heavily that even the
    narrow partial-aggregation hash maps skew (e.g. one turn updated millions
    of times per batch). The salt is derived from the order column, so
    distribution is uniform and deterministic."""
    key = key or TRANSCRIPT_KEY
    cols = events.columns
    salted = events.select(
        *key, F.col(order_col), F.pmod(F.col(order_col), F.lit(salt_buckets)).cast("int").alias("__salt")
    )
    stage1 = salted.groupBy(*key, "__salt").agg(F.max(order_col).alias(order_col))
    winners = stage1.groupBy(*key).agg(F.max(order_col).alias(order_col))
    return _join_back(events, winners, key, order_col).select(*cols)
