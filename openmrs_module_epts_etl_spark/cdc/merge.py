"""MERGE INTO for the lake table: lsn-guarded, partition-pruned copy-on-write.

Semantics (the heart of the reference, re-expressed — SURVEY.md §2.9):

- action dispatch by event op (api:etl/model/EtlLoadHelper.java:274-300):
  I/U → upsert, D → delete;
- staleness guard ``src.lsn > dst._lsn`` — the analog of
  ``observationDateFields`` newer-wins conflict resolution
  (api:model/EtlDatabaseObject.java:677-714): a stale update delivered after a
  newer one was applied is *skipped*, recorded as ``stale_skip``;
- KEEP_EXISTING ≈ the guard failing; UPDATE_EXISTING ≈ the guard passing
  (api:conf/types/ConflictResolutionType.java:1-47);
- idempotence by construction: re-applying any batch (or the whole feed)
  changes nothing — no duplicate-key exception path like the reference's
  insert-else-resolve (api:model/pojo/generic/DatabaseObjectDAO.java:573-599);
- **delete tombstones**: a delete persists as a hidden lsn-stamped tombstone
  row (``_deleted = true``, payload nulled) instead of physically vanishing.
  Without the tombstone, an out-of-order *stale* insert (lower lsn) arriving
  in a later epoch would resurrect the key — the lsn guard needs something to
  compare against. Tombstones are invisible to user reads and are GC'd by
  :func:`vacuum_tombstones` once older than the feed's out-of-order horizon.

Physical plan (designed for a 1000-executor cluster / 100 TB table):

1. dedupe the batch per key with map-side-combining ``max_by`` (skew-safe);
2. **bucket pruning**: conv_id buckets are recomputable from the events alone,
   so the target scan is restricted to the touched buckets before any I/O;
3. find affected (ts_day, bucket) partitions with a **left-semi join** of the
   pruned target against the batch keys (broadcast when the batch is small);
4. rewrite only files in affected partitions. The merge itself is expressed as
   dst-LEFT-JOIN-batch (keep/update/delete/stale) UNION batch-ANTI-dst
   (insert) — deliberately *not* a full-outer join, because full-outer cannot
   use a broadcast hash join in Spark; with the two-join form the big side
   (the table) never shuffles when the batch broadcasts.
5. per-partition lineage + applied/skipped metrics are aggregated from the
   action-tagged frame and stored in the commit (analog of the dst-stage
   ``conflict_resolution_type`` column and the progress meter,
   api:conf/interfaces/TableConfiguration.java:2343-2380;
   api:engine/EtlProgressMeter.java:39-96).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..lake.table import Commit, LakeTable
from .dedupe import dedupe_latest
from .schemas import TRANSCRIPT_KEY, payload_columns

BROADCAST_BATCH_MAX_ROWS = 4_000_000  # ~hundreds of MB of keys+payload; tune per cluster
ACTIONS = ("insert", "update", "delete", "delete_new", "keep", "stale_skip")


@dataclass
class MergeResult:
    commit: Commit | None
    applied: dict[str, int] = field(default_factory=dict)
    by_partition: list[dict] = field(default_factory=list)
    skipped_epoch: bool = False

    @property
    def rows_changed(self) -> int:
        return sum(self.applied.get(a, 0) for a in ("insert", "update", "delete", "delete_new"))


def merge_into(
    table: LakeTable,
    events: DataFrame,
    key: list[str] | None = None,
    fence_key: str | None = None,
    epoch_id: int | None = None,
    max_partition_metrics: int = 1024,
) -> MergeResult:
    key = key or TRANSCRIPT_KEY

    # ---- exactly-once fence ------------------------------------------------
    if fence_key is not None and epoch_id is not None:
        if table.epoch_already_applied(fence_key, epoch_id):
            return MergeResult(commit=None, skipped_epoch=True)
    epoch = {"fence_key": fence_key, "epoch_id": epoch_id} if fence_key is not None else None

    # ---- 1. per-key winner for this batch -----------------------------------
    batch = dedupe_latest(events, key=key).persist()
    try:
        spec_early = table.partition_spec
        key_derived_early = [p for p in spec_early if p.source in key]
        # one job: batch row count + the touched bucket values (scan pruning
        # hints) — avoids a separate count() round trip per epoch
        if key_derived_early:
            hint_rows = (
                batch.groupBy(
                    *[
                        F.coalesce(p.expr_fn(p.source).cast("string"), F.lit("__HIVE_DEFAULT_PARTITION__")).alias(p.name)
                        for p in key_derived_early
                    ]
                )
                .count()
                .collect()
            )
            batch_rows = sum(r["count"] for r in hint_rows)
        else:
            hint_rows = None
            batch_rows = batch.count()
        if batch_rows == 0:
            commit = table.commit([], epoch=epoch, metrics={"applied": {}, "by_partition": []})
            return MergeResult(commit=commit, applied={})

        # ---- 2. additive schema evolution -----------------------------------
        pay_cols = payload_columns(events.schema)
        incoming = StructType([events.schema[c] for c in pay_cols])
        new_schema = table.evolved_schema(incoming)
        if new_schema is not None:
            # publish the widened schema on this commit; reads fill nulls
            table._commit.schema_json = new_schema.json()
        schema = table.schema
        table_cols = [f.name for f in schema.fields]

        spec = table.partition_spec
        part_names = [p.name for p in spec]

        HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

        def part_exprs(prefix: str = ""):
            # null partition values are hive-encoded in file paths; normalize
            # so driver-side set membership matches the manifest strings
            return [
                F.coalesce(p.expr_fn(prefix + p.source).cast("string"), F.lit(HIVE_NULL)).alias(
                    p.name
                )
                for p in spec
            ]

        # ---- 3. bucket pruning from the batch alone ---------------------------
        key_derived = key_derived_early
        candidate_files = table.files
        if key_derived and candidate_files and hint_rows is not None:
            hints = {tuple(r[p.name] for p in key_derived) for r in hint_rows}
            candidate_files = [
                f
                for f in candidate_files
                if tuple(f.partition.get(p.name) for p in key_derived) in hints
            ]

        maybe_bcast = F.broadcast if batch_rows <= BROADCAST_BATCH_MAX_ROWS else (lambda d: d)

        # ---- 4. affected partitions: semi-join pruned target vs batch keys ----
        target = table.read(files=candidate_files, include_hidden=True)
        batch_keys = batch.select(*key).distinct()
        matched_parts = (
            target.join(maybe_bcast(batch_keys), on=key, how="left_semi")
            .select(*part_exprs())
            .distinct()
        )
        insert_parts = batch.filter(F.col("op") != "D").select(*part_exprs()).distinct()
        affected = {
            tuple(r[n] for n in part_names)
            for r in matched_parts.unionByName(insert_parts).distinct().collect()
        } if spec else {()}

        rewrite_files = [
            f
            for f in candidate_files
            if tuple(f.partition.get(n) for n in part_names) in affected
        ] if spec else candidate_files

        # ---- 5. merge: dst LEFT JOIN batch ∪ batch ANTI dst --------------------
        dst = table.read(files=rewrite_files, include_hidden=True).alias("d")
        src_payload = [F.col(f"s.{c}").alias(c) for c in pay_cols if c in table_cols]
        # evolution gap: table may have columns the batch lacks (never happens
        # additively, but guard), and vice versa is handled by evolved_schema.
        s = batch.alias("s")
        cond = [F.col(f"d.{k}") == F.col(f"s.{k}") for k in key]

        joined = dst.join(maybe_bcast(s), on=cond, how="left")
        has_src = F.col("s.lsn").isNotNull()
        newer = has_src & (F.col("s.lsn") > F.coalesce(F.col("d._lsn"), F.lit(-1)))
        action_matched = (
            F.when(~has_src, F.lit("keep"))
            .when(~newer, F.lit("stale_skip"))
            .when(F.col("s.op") == "D", F.lit("delete"))
            .otherwise(F.lit("update"))
        )

        applied_src = F.col("__action").isin("update", "delete")

        def pick(c: str):
            if c == "_lsn":
                out = F.when(applied_src, F.col("s.lsn")).otherwise(F.col("d._lsn"))
            elif c == "_origin":
                out = F.when(applied_src, F.col("s.origin")).otherwise(F.col("d._origin"))
            elif c == "_deleted":
                out = (
                    F.when(F.col("__action") == "delete", F.lit(True))
                    .when(F.col("__action") == "update", F.lit(False))
                    .otherwise(F.coalesce(F.col("d._deleted"), F.lit(False)))
                )
            elif c in pay_cols:
                # update → new payload; delete → tombstone retains the dst
                # payload (keeps ts, so the tombstone stays in the same
                # partition — a null ts would migrate it to the hive null
                # partition and defeat partition-match bookkeeping)
                out = F.when(F.col("__action") == "update", F.col(f"s.{c}")).otherwise(
                    F.col(f"d.{c}")
                )
            else:
                out = F.col(f"d.{c}")
            return out.cast(schema[c].dataType).alias(c)

        from_dst = joined.withColumn("__action", action_matched).select(
            *[pick(c) for c in table_cols], F.col("__action")
        )

        inserts_src = batch.alias("s").join(dst.select(*key).alias("d"), on=cond, how="left_anti")
        # unmatched delete still writes a tombstone: the key may get a stale
        # out-of-order insert in a later epoch, which must be fenced by lsn
        action_new = F.when(F.col("op") == "D", F.lit("delete_new")).otherwise(F.lit("insert"))

        def pick_new(c: str):
            if c == "_lsn":
                out = F.col("lsn")
            elif c == "_origin":
                out = F.col("origin")
            elif c == "_deleted":
                out = F.col("op") == "D"
            elif c in key or c == "ts":
                # keys always persist (a tombstone is addressed by key), and
                # ts persists for partition placement of the tombstone
                out = F.col(c)
            elif c in pay_cols:
                out = F.when(F.col("op") == "D", F.lit(None)).otherwise(F.col(c))
            else:
                out = F.lit(None)
            return out.cast(schema[c].dataType).alias(c)

        from_src = inserts_src.select(*[pick_new(c) for c in table_cols], action_new.alias("__action"))

        merged = from_dst.unionByName(from_src).persist()
        try:
            # ---- lineage + metrics (per partition, per action) ----------------
            stats = (
                merged.groupBy(*part_exprs(), F.col("__action"))
                .count()
                .collect()
            )
            applied: dict[str, int] = {}
            by_partition: list[dict] = []
            for r in stats:
                applied[r["__action"]] = applied.get(r["__action"], 0) + r["count"]
                if len(by_partition) < max_partition_metrics:
                    by_partition.append(
                        {
                            "partition": {n: r[n] for n in part_names},
                            "action": r["__action"],
                            "rows": r["count"],
                        }
                    )

            if not any(applied.get(a) for a in ("insert", "update", "delete", "delete_new")):
                # nothing changed — metadata-only commit records the fence
                commit = table.commit(
                    [], epoch=epoch, new_schema=new_schema,
                    metrics={"applied": applied, "by_partition": by_partition},
                )
                return MergeResult(commit=commit, applied=applied, by_partition=by_partition)

            # every action survives: deletes persist as tombstone rows
            survivors = merged.drop("__action")

            commit = table.overwrite_partitions(
                survivors,
                replaced=rewrite_files,
                epoch=epoch,
                new_schema=new_schema,
                metrics={"applied": applied, "by_partition": by_partition},
            )
            return MergeResult(commit=commit, applied=applied, by_partition=by_partition)
        finally:
            merged.unpersist()
    finally:
        batch.unpersist()


def vacuum_tombstones(table: LakeTable, min_lsn_keep: int) -> Commit | None:
    """GC delete tombstones whose lsn is below the out-of-order horizon.

    Once every event with lsn < ``min_lsn_keep`` has certainly been delivered
    (the feed's bounded out-of-order window has passed), a tombstone older
    than that can never fence anything again and is dead weight. Rewrites only
    the files that actually contain expired tombstones. The analog of the
    reference clearing its ``skipped_record`` ledger at interval end
    (api:engine/Engine.java:367-406).
    """
    expired = F.coalesce(F.col("_deleted"), F.lit(False)) & (F.col("_lsn") < min_lsn_keep)
    # driver-side: find files containing expired tombstones (per-file scan is
    # metadata-cheap: predicate pushdown on _deleted/_lsn prunes row groups)
    dirty: list = []
    for f in table.files:
        df = table.read(files=[f], include_hidden=True)
        if df.filter(expired).limit(1).count() > 0:
            dirty.append(f)
    if not dirty:
        return None
    keep = table.read(files=dirty, include_hidden=True).filter(~expired)
    return table.overwrite_partitions(
        keep, replaced=dirty, metrics={"applied": {"vacuumed_files": len(dirty)}}
    )
