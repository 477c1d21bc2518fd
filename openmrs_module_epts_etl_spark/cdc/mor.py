"""Merge-on-read (MoR) ingest: append lsn-stamped deltas, resolve at read.

The copy-on-write MERGE (cdc/merge.py) rewrites every affected partition per
epoch — with hot conversations touching most buckets, that is a near-full
table rewrite per epoch: write amplification O(table_size × epochs). Real
10^10-event/day ingest systems (Iceberg v2 equality deletes, Hudi MoR) take
the dual trade: ingest appends small delta files and defers conflict
resolution to readers and to a periodic compaction. This module is that dual,
over the same lake format, same event semantics, same fences:

- **append_delta**: dedupe the batch per key (max-lsn winner via the same
  narrow-agg + join-back operator as CoW), stamp ``_lsn``/``_origin``/
  ``_deleted`` and append. No target scan, no planning join, no rewrite: one
  shuffle (dedupe) + one clustered write per epoch, which is why ingest
  scales like the append it is. Epoch fencing is identical to CoW
  (commit-log (fence_key, epoch_id)), so replays are no-ops.
- **read_state**: snapshot read = latest row per key by ``_lsn`` with delete
  tombstones filtered. An out-of-order stale insert arriving *after* a
  delete loses the max-lsn contest to the delete's higher lsn — the same guard CoW
  enforces at write time, enforced here at read time. Conflict-resolution
  semantics (newer-wins ≈ observationDateFields,
  api:model/EtlDatabaseObject.java:677-714) are therefore byte-identical
  between modes.
- **compact_latest**: collapse all versions of each key to the winner (one
  partition-local... shuffle bounded per conv_id bucket since buckets are
  key-derived), rewriting the table back to one-row-per-key — after which
  reads are plain scans again. Run every K epochs or by delta-file-count
  policy; replay-safe via its own fence.

Choosing a mode: CoW when reads dominate and epochs are large; MoR when
ingest throughput/latency dominates and a compaction window exists. The
pipeline exposes both (PipelineConfig.mode) over the same feed, table,
checkpoint, and oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake.table import Commit, LakeTable
from .dedupe import dedupe_latest, dedupe_latest_clustered
from .merge import MergeResult
from .schemas import TRANSCRIPT_KEY, payload_columns


def _clustered_plan(table: LakeTable, key: list[str]) -> tuple[str, int] | None:
    """(cluster_col, num_partitions) when the table's spec murmur-buckets a
    key column — the layout under which a single ``repartition(N, col)``
    serves the dedupe aggregation, the semi join-back, AND the partitioned
    write (``arrange=False``): N is the shuffle-partition count rounded up to
    a multiple of the bucket count so the task id determines the bucket
    (lake/partitioning.py:mbucket). xxhash64 ``bucket`` specs return None —
    their bucket value is not derivable from Spark's task assignment."""
    for p in table.partition_spec:
        if p.transform.startswith("mbucket(") and p.source in key:
            n = int(p.transform[len("mbucket(") :].split(",")[0])
            sp = int(table.spark.conf.get("spark.sql.shuffle.partitions", "200"))
            return p.source, max(-(-sp // n) * n, n)
    return None


def _dedupe_for_table(
    table: LakeTable, df: DataFrame, key: list[str], order_col: str,
    on_null: str = "error",
) -> tuple[DataFrame, bool]:
    """Winner selection shaped to the table's layout: clustered one-exchange
    plan when the spec allows (second return True → write with
    ``arrange=False``), the generic narrow-agg + join-back otherwise.

    ``on_null`` is the clustered path's NULL-key policy, plumbed through
    every public entry point that can reach this (``append_delta``,
    ``compact_partitions``, ``compact_latest``, ``PipelineConfig``): the
    default ``"error"`` enforces the non-null feed contract loudly, but the
    default *append* path writes events raw (dedupe=False), so a NULL-keyed
    row that slipped into an mbucket table would otherwise wedge every
    future compaction with no recovery path short of manual table surgery —
    ``on_null="drop"`` is that recovery path (the dropped row could never
    win a read-time max-lsn contest usefully anyway: ``read_state``'s
    generic dedupe groups it under the NULL key, which no real key matches).
    The generic path keeps NULL-key groups (SQL semantics) either way."""
    plan = _clustered_plan(table, key)
    if plan:
        return (
            dedupe_latest_clustered(
                df, key=key, order_col=order_col,
                cluster_col=plan[0], num_partitions=plan[1], on_null=on_null,
            ),
            True,
        )
    return dedupe_latest(df, key=key, order_col=order_col), False


def append_delta(
    table: LakeTable,
    events: DataFrame,
    key: list[str] | None = None,
    fence_key: str | None = None,
    epoch_id: int | None = None,
    dedupe: bool = False,
    on_null: str = "error",
) -> MergeResult:
    """Apply one epoch as an appended delta. Returns applied counts
    {delta_upsert, delta_delete} (exact split between insert/update is
    unknowable without reading the target — that is the point of MoR).

    ``dedupe=False`` (default) appends every event as its own delta row: the
    read-time / compaction-time max-lsn winner selection resolves per-key winners
    anyway, so a per-epoch dedupe is pure compression — it removes the only
    table-wide shuffle-with-aggregation in the append path (the remaining
    exchange just clusters rows by partition value for the writer). Enable it
    when epochs are huge and duplicate-heavy (many updates of the same turn
    inside one epoch), where fewer delta rows are worth the shuffle —
    measured at 2.7 events/key/epoch (32M-event replay): +31%/+10% events/s
    at 2/8 cores (PipelineConfig.mor_dedupe_appends exposes this)."""
    key = key or TRANSCRIPT_KEY
    if fence_key is not None and epoch_id is not None:
        if table.epoch_already_applied(fence_key, epoch_id):
            return MergeResult(commit=None, skipped_epoch=True)
    epoch = {"fence_key": fence_key, "epoch_id": epoch_id} if fence_key is not None else None

    clustered = False
    if dedupe:
        batch, clustered = _dedupe_for_table(table, events, key, "lsn", on_null=on_null)
    else:
        batch = events
    is_del = F.col("op") == "D"
    cols = [F.col(k) for k in key]
    for c in payload_columns(events.schema):
        if c in key:
            continue
        if c == "ts":
            # ts persists on delete tombstones for partition placement,
            # exactly like the CoW path
            cols.append(F.col(c))
        else:
            cols.append(F.when(is_del, F.lit(None)).otherwise(F.col(c)).alias(c))
    delta = batch.select(
        *cols,
        F.col("lsn").alias("_lsn"),
        F.col("origin").alias("_origin"),
        is_del.alias("_deleted"),
    )

    from pyspark.sql import Observation

    obs = Observation()
    delta = delta.observe(
        obs,
        F.count_if(~F.col("_deleted")).alias("delta_upsert"),
        F.count_if(F.col("_deleted")).alias("delta_delete"),
    )

    # additive evolution before the write so new columns survive the
    # projection to table schema (same order of operations as LakeTable.append)
    new_schema = table.evolved_schema(delta.schema)
    if new_schema is not None:
        table._commit.schema_json = new_schema.json()
    added, _ = table.write_data_files(delta, arrange=not clustered)
    applied = {k: int(v) for k, v in obs.get.items() if v}
    commit = table.commit(
        added, epoch=epoch, new_schema=new_schema,
        metrics={"applied": applied, "mode": "mor-delta"},
    )
    return MergeResult(commit=commit, applied=applied)


def read_state(table: LakeTable, key: list[str] | None = None) -> DataFrame:
    """User-facing snapshot under MoR: latest version per key, tombstones
    hidden, engine columns dropped. On a freshly compacted table this
    degenerates to a plain scan of one row per key (the dedupe is a no-op
    aggregation over singleton groups)."""
    key = key or TRANSCRIPT_KEY
    df = table.read(include_hidden=True)
    latest = dedupe_latest(df, key=key, order_col="_lsn")
    alive = latest.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    return alive.select(*[c for c in alive.columns if not c.startswith("_")])


def table_changes_as_feed(
    table: LakeTable, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Convert an incremental scan of a MoR-ingested table into the engine's
    change-event contract (op/lsn/origin + payload) so a *downstream*
    pipeline can consume this table as its binlog — pipeline chaining, the
    lake-side analog of the reference emitting detected_record_info for the
    next stage (SURVEY.md §3.2). Exact row granularity on MoR delta commits
    (each delta row is one applied event, tombstones → op='D')."""
    inc = table.read_incremental(from_version, to_version, include_hidden=True)
    deleted = F.coalesce(F.col("_deleted"), F.lit(False))
    payload = [c for c in inc.columns if not c.startswith("_")]
    return inc.select(
        F.when(deleted, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("_lsn").alias("lsn"),
        F.col("_origin").alias("origin"),
        *payload,
    )


def compact_partitions(
    table: LakeTable,
    key: list[str] | None = None,
    min_files: int = 8,
    fence_key: str | None = None,
    epoch_id: int | None = None,
    keep_tombstones: bool = True,
    on_null: str = "error",
) -> Commit | None:
    """Partition-selective compaction: collapse versions only in partitions
    holding ≥ ``min_files`` data files — the bounded-I/O form a 100 TB MoR
    table actually runs (``compact_latest``'s whole-table rewrite is the
    small-table / migration tool; at scale compaction must touch only the
    hot buckets the ingest skew keeps appending to).

    Correctness does not depend on partition semantics at all: the dedupe is
    max-``_lsn`` restricted to the SELECTED FILES, and any row it discards
    is dominated by a same-key higher-lsn row inside the selection — which
    dominates it globally too, so ``read_state``'s global winner selection
    is unchanged. A key whose global winner lives in an unselected file may
    keep a locally-winning stale version; the read-time contest still picks
    the global winner. Old-spec files in a selected group get rewritten
    under the current spec as a side effect (incremental layout migration).

    Cost: O(selected partitions), one dedupe shuffle over their rows. Files
    grouped by (spec_id, partition tuple) — stale pre-evolution partition
    values only affect GROUPING granularity, never correctness."""
    key = key or TRANSCRIPT_KEY
    if fence_key is not None and epoch_id is not None:
        if table.epoch_already_applied(fence_key, epoch_id):
            return None
    groups: dict[tuple, list] = {}
    for f in table.files:
        groups.setdefault((f.spec_id, tuple(sorted(f.partition.items()))), []).append(f)
    selected = [f for g in groups.values() if len(g) >= min_files for f in g]
    if not selected:
        return None
    df = table.read(files=selected, include_hidden=True)
    winners, clustered = _dedupe_for_table(table, df, key, "_lsn", on_null=on_null)
    if not keep_tombstones:
        winners = winners.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    epoch = {"fence_key": fence_key, "epoch_id": epoch_id} if fence_key is not None else None
    return table.overwrite_partitions(
        winners,
        replaced=selected,
        epoch=epoch,
        arrange=not clustered,
        metrics={
            "applied": {
                "compacted_files": len(selected),
                "compacted_partitions": sum(
                    1 for g in groups.values() if len(g) >= min_files
                ),
                "skipped_files": len(table.files) - len(selected),
            },
            "mode": "mor-compact-partitions",
        },
    )


def compact_latest(
    table: LakeTable,
    key: list[str] | None = None,
    fence_key: str | None = None,
    epoch_id: int | None = None,
    keep_tombstones: bool = True,
    on_null: str = "error",
) -> Commit | None:
    """Collapse every key to its winning version; rewrites the whole current
    file set (the MoR analog of the CoW epoch rewrite, paid once per K
    epochs instead of every epoch). Tombstones are kept by default so the
    lsn fence against stale out-of-order inserts survives compaction; drop
    them only past the feed's out-of-order horizon (see vacuum_tombstones).
    """
    key = key or TRANSCRIPT_KEY
    if fence_key is not None and epoch_id is not None:
        if table.epoch_already_applied(fence_key, epoch_id):
            return None
    files = table.files
    if not files:
        return None
    df = table.read(files=files, include_hidden=True)
    winners, clustered = _dedupe_for_table(table, df, key, "_lsn", on_null=on_null)
    if not keep_tombstones:
        winners = winners.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    epoch = {"fence_key": fence_key, "epoch_id": epoch_id} if fence_key is not None else None
    return table.overwrite_partitions(
        winners,
        replaced=files,
        epoch=epoch,
        arrange=not clustered,
        metrics={"applied": {"compacted_files": len(files)}, "mode": "mor-compact"},
    )
