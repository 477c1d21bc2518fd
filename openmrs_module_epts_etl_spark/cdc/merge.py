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

Physical plan (designed for a 1000-executor cluster / 100 TB table) — exactly
three Spark jobs per epoch, so the driver-side constant cost stays far below
the distributed work and N→4N scaling holds:

1. **hint job**: per-bucket counts of the deduped batch (narrow max-lsn
   hash aggregation + semi join-back, skew-safe — cdc/dedupe.py) → batch
   size + the conv_id buckets it touches. Bucket values are recomputable from the events alone, so the
   target scan is pruned to the touched buckets before any I/O.
2. **planning job**: one column-pruned semi-join of the pruned target against
   the batch keys (broadcast when the batch is small) yields, in a single
   pass, (a) the affected (ts_day, bucket) partitions whose files must be
   rewritten and (b) the set of matched keys. The matched-key set — persisted,
   ≤ batch size — replaces a second full anti-join scan of the target for
   insert detection.
3. **write job**: the merge is dst-LEFT-JOIN-batch (keep/update/delete/stale)
   UNION batch-ANTI-matched-keys (insert) — deliberately *not* a full-outer
   join, because full-outer cannot use a broadcast hash join; with this form
   the big side (the table) **never shuffles**: dst files are partition-pure,
   so rewritten rows pass straight through to the partitioned writer with no
   exchange, exactly like Iceberg's copy-on-write MERGE. Only the small
   insert branch is shuffled (clustered by partition value). Applied/skipped
   metrics ride on this job via ``Observation`` — no separate metrics pass.

Per-partition lineage + applied/skipped metrics are stored in the commit
(analog of the dst-stage ``conflict_resolution_type`` column and the progress
meter, api:conf/interfaces/TableConfiguration.java:2343-2380;
api:engine/EtlProgressMeter.java:39-96).
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field
from urllib.parse import unquote

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..lake.table import Commit, LakeTable, file_may_match
from .conflict import NEWER_WINS, ConflictPolicy
from .dedupe import dedupe_latest
from .schemas import TRANSCRIPT_KEY, payload_columns

# Keys-only frames (a few tens of bytes/row) are broadcast up to this many
# rows; the full payload batch is left to AQE, which converts the join to
# broadcast at runtime iff the actual batch bytes are under the threshold —
# force-broadcasting a multi-hundred-MB payload serializes epoch time on the
# driver-side relation build and does not scale with executors.
BROADCAST_KEYS_MAX_ROWS = 4_000_000
ACTIONS = ("insert", "update", "delete", "delete_new", "keep", "stale_skip", "policy_keep")
CHANGE_ACTIONS = ("insert", "update", "delete", "delete_new")
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


@dataclass
class MergeResult:
    commit: Commit | None
    applied: dict[str, int] = field(default_factory=dict)
    by_partition: list[dict] = field(default_factory=list)
    skipped_epoch: bool = False
    timings: dict[str, float] = field(default_factory=dict)

    @property
    def rows_changed(self) -> int:
        return sum(self.applied.get(a, 0) for a in CHANGE_ACTIONS)


def merge_into(
    table: LakeTable,
    events: DataFrame,
    key: list[str] | None = None,
    fence_key: str | None = None,
    epoch_id: int | None = None,
    max_partition_metrics: int = 1024,
    policy: ConflictPolicy | None = None,
) -> MergeResult:
    key = key or TRANSCRIPT_KEY
    policy = policy or NEWER_WINS
    timings: dict[str, float] = {}
    t_start = time.perf_counter()

    # ---- exactly-once fence ------------------------------------------------
    if fence_key is not None and epoch_id is not None:
        if table.epoch_already_applied(fence_key, epoch_id):
            return MergeResult(commit=None, skipped_epoch=True)
    epoch = {"fence_key": fence_key, "epoch_id": epoch_id} if fence_key is not None else None

    # ---- job 1: per-key winner + bucket hints -------------------------------
    batch = dedupe_latest(events, key=key).persist()
    m = None
    try:
        spec = table.partition_spec
        part_names = [p.name for p in spec]
        key_derived = [p for p in spec if p.source in key]

        def part_exprs(prefix: str = ""):
            # null partition values are hive-encoded in file paths; normalize
            # so driver-side set membership matches the manifest strings
            return [
                F.coalesce(p.expr_fn(prefix + p.source).cast("string"), F.lit(HIVE_NULL)).alias(
                    p.name
                )
                for p in spec
            ]

        # one aggregation job returns, at once: batch row count, the touched
        # key-derived partition values (bucket-prune hints), the partition
        # tuples that inserts may land in, AND a per-group distinct-key count
        # — no separate distinct/collect jobs. count > distinct keys within a
        # group means the post-dedupe batch still holds duplicate key rows:
        # the lsn-uniqueness invariant was violated upstream (duplicate
        # delivery past the fence). Detection here is ~free; only then do we
        # pay for the strict tie-breaking dedupe, so a clean feed never does.
        # (A same-lsn tie whose rows differ in op or event-time partition
        # lands in different groups and escapes this check — that is a feed
        # corrupt beyond duplicate delivery; null-key rows are quarantined
        # before merge, so count_distinct's null-tuple skip can at worst
        # trigger a spurious — harmless — strict re-dedupe.)
        key_cols = [F.col(k) for k in key]

        def compute_hints(b: DataFrame):
            if spec:
                rows = (
                    b.groupBy(*part_exprs(), (F.col("op") != "D").alias("__ins"))
                    .agg(
                        F.count(F.lit(1)).alias("count"),
                        F.count_distinct(*key_cols).alias("__nkeys"),
                    )
                    .collect()
                )
                return rows, sum(r["count"] for r in rows), any(
                    r["count"] > r["__nkeys"] for r in rows
                )
            row = b.agg(
                F.count(F.lit(1)).alias("count"),
                F.count_distinct(*key_cols).alias("__nkeys"),
            ).collect()[0]
            return None, row["count"], row["count"] > row["__nkeys"]

        hint_rows, batch_rows, tie_violation = compute_hints(batch)
        if tie_violation:
            batch.unpersist()
            batch = dedupe_latest(events, key=key, tie_break=True).persist()
            hint_rows, batch_rows, _ = compute_hints(batch)
        timings["hint"] = time.perf_counter() - t_start
        if batch_rows == 0:
            commit = table.commit([], epoch=epoch, metrics={"applied": {}, "by_partition": []})
            return MergeResult(commit=commit, applied={}, timings=timings)

        # ---- additive schema evolution --------------------------------------
        pay_cols = payload_columns(events.schema)
        incoming = StructType([events.schema[c] for c in pay_cols])
        new_schema = table.evolved_schema(incoming)
        if new_schema is not None:
            # publish the widened schema on this commit; reads fill nulls
            table._commit.schema_json = new_schema.json()
        schema = table.schema
        table_cols = [f.name for f in schema.fields]

        # ---- bucket pruning from the batch alone ----------------------------
        # files from an older partition spec (pre-evolution layout) carry
        # stale partition values — they can never be pruned by current-spec
        # hints, only rewritten; migrate_layout shrinks that set over time
        candidate_files = table.files
        cur_spec = table.spec_id
        if key_derived and candidate_files and hint_rows is not None:
            hints = {tuple(r[p.name] for p in key_derived) for r in hint_rows}
            candidate_files = [
                f
                for f in candidate_files
                if f.spec_id != cur_spec
                or tuple(f.partition.get(p.name) for p in key_derived) in hints
            ]

        bcast_keys = F.broadcast if batch_rows <= BROADCAST_KEYS_MAX_ROWS else (lambda d: d)

        # ---- job 2: planning semi-join — affected partitions + matched keys --
        t0 = time.perf_counter()
        target = table.read(files=candidate_files, include_hidden=True)
        batch_keys = batch.select(*key)  # already key-unique after dedupe
        # column-pruned scan: only key + partition-source columns are read
        m = (
            target.join(bcast_keys(batch_keys), on=key, how="left_semi")
            .select(*key, *part_exprs())
            .persist()
        )
        if spec:
            insert_parts = {
                tuple(r[n] for n in part_names) for r in hint_rows if r["__ins"]
            }
            matched_parts = {
                tuple(r[n] for n in part_names)
                for r in m.select(*part_names).distinct().collect()
            }
            affected = matched_parts | insert_parts
        else:
            affected = {()}
        timings["plan"] = time.perf_counter() - t0

        cur_files = [f for f in candidate_files if f.spec_id == cur_spec]
        old_files = [f for f in candidate_files if f.spec_id != cur_spec]
        rewrite_files = (
            [
                f
                for f in cur_files
                if tuple(f.partition.get(n) for n in part_names) in affected
            ]
            if spec
            else list(cur_files)
        )
        if old_files:
            # pre-evolution files can't be selected by current-spec partition
            # tuples; probe them directly — one bounded semi-join over the
            # (shrinking, post-evolution-only) old-layout set. A matched old
            # file gets rewritten and thereby MIGRATES to the current layout;
            # untouched old files stay until migrate_layout sweeps them.
            # input_file_name() is captured AT SCAN TIME, before the join:
            # selected after a sort-merge semi-join (what AQE picks once the
            # batch outgrows the broadcast hint cap) it returns '' and matched
            # old-spec files would silently escape rewrite, leaving a stale
            # duplicate live next to the new row version.
            hit = {
                r["__f"]
                for r in table.read(files=old_files, include_hidden=True)
                .withColumn("__f", F.input_file_name())
                .join(bcast_keys(batch_keys), on=key, how="left_semi")
                .select("__f")
                .distinct()
                .collect()
            }
            # input_file_name() yields a percent-encoded URI; manifest paths
            # are raw — unquote before comparing or hive-escaped partition
            # values (space, ':', '%') never match.
            hit_decoded = {unquote(h) for h in hit}
            rewrite_files += [
                f for f in old_files if any(h.endswith("/" + f.path) for h in hit_decoded)
            ]

        # ---- job 3: merge + write + metrics in ONE pass -----------------------
        t0 = time.perf_counter()
        dst = table.read(files=rewrite_files, include_hidden=True).alias("d")
        s = batch.alias("s")
        cond = [F.col(f"d.{k}") == F.col(f"s.{k}") for k in key]

        joined = dst.join(s, on=cond, how="left")  # AQE picks broadcast iff small
        has_src = F.col("s.lsn").isNotNull()
        # Conflict resolution per matched pair (cdc/conflict.py — the
        # ConflictResolutionType catalog). Explicit policies govern I/U events
        # against live dst rows only: deletes are a separately dispatched
        # action in the reference (api:etl/model/EtlLoadHelper.java:274-300),
        # and a tombstoned dst means "no existing record" to a policy — both
        # fall back to the lsn guard, so reinsert-after-delete works and stale
        # out-of-order events stay fenced regardless of policy.
        lsn_newer = F.col("s.lsn") > F.coalesce(F.col("d._lsn"), F.lit(-1))
        if policy.is_default:
            wins, loss_label = lsn_newer, F.lit("stale_skip")
        else:
            guard_decides = F.coalesce(F.col("d._deleted"), F.lit(False)) | (
                F.col("s.op") == "D"
            )
            wins = F.when(guard_decides, lsn_newer).otherwise(policy.src_wins())
            loss_label = F.when(guard_decides, F.lit("stale_skip")).otherwise(
                F.lit(policy.loss_action)
            )
        newer = has_src & wins
        action_matched = (
            F.when(~has_src, F.lit("keep"))
            .when(~newer, loss_label)
            .when(F.col("s.op") == "D", F.lit("delete"))
            .otherwise(F.lit("update"))
        )

        applied_src = F.col("__action").isin("update", "delete")

        def pick(c: str):
            if c == "_lsn":
                # high-water mark: under the default policy wins ⇒ s.lsn is
                # already the max; explicit policies may apply an older event's
                # payload, but the fence must never regress
                out = F.when(
                    applied_src,
                    F.greatest(F.col("s.lsn"), F.coalesce(F.col("d._lsn"), F.lit(-1).cast("long"))),
                ).otherwise(F.col("d._lsn"))
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

        # insert detection against the persisted matched-key set — no second
        # scan of the target. An unmatched delete still writes a tombstone:
        # the key may get a stale out-of-order insert in a later epoch, which
        # must be fenced by lsn.
        inserts_src = batch.join(bcast_keys(m.select(*key)), on=key, how="left_anti")
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

        from_src = inserts_src.select(
            *[pick_new(c) for c in table_cols], action_new.alias("__action")
        )

        obs = Observation()
        merged = from_dst.unionByName(from_src).observe(
            obs, *[F.count_if(F.col("__action") == a).alias(a) for a in ACTIONS]
        )

        # arranged write: one exchange clustering by partition value, AQE
        # coalescing small partitions — every rewrite resets a partition's
        # file count, so file granularity can't snowball across epochs (the
        # exchange-free alternative preserves input file counts and grows
        # them with every epoch's inserts — measurably worse past a few
        # epochs without a compaction pass)
        added, rel_dir = table.write_data_files(merged.drop("__action"), arrange=True)
        applied = {a: int(v) for a, v in obs.get.items() if v}
        timings["write"] = time.perf_counter() - t0

        # ---- per-partition lineage from the new manifest ----------------------
        by_partition: list[dict] = []
        part_agg: dict[tuple, dict] = {}
        for f in added:
            k = tuple(f.partition.get(n) for n in part_names)
            e = part_agg.setdefault(k, {"rows": 0, "files": 0})
            e["rows"] += f.rows
            e["files"] += 1
        for k, e in sorted(part_agg.items()):
            if len(by_partition) >= max_partition_metrics:
                break
            by_partition.append(
                {"partition": dict(zip(part_names, k)), "rows": e["rows"], "files": e["files"]}
            )
        metrics = {"applied": applied, "by_partition": by_partition}

        if not any(applied.get(a) for a in CHANGE_ACTIONS):
            # nothing changed — drop the identical rewrite, record the fence
            # in a metadata-only commit (rare: pure-stale / pure-keep epoch)
            shutil.rmtree(os.path.join(table.path, rel_dir), ignore_errors=True)
            commit = table.commit([], epoch=epoch, new_schema=new_schema, metrics=metrics)
            return MergeResult(commit=commit, applied=applied, timings=timings)

        commit = table.commit(
            added,
            remove_paths={f.path for f in rewrite_files},
            epoch=epoch,
            new_schema=new_schema,
            metrics=metrics,
        )
        timings["total"] = time.perf_counter() - t_start
        return MergeResult(
            commit=commit, applied=applied, by_partition=by_partition, timings=timings
        )
    finally:
        if m is not None:
            m.unpersist()
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
    # manifest-level data skipping first: a file whose stats show no
    # _deleted=true row or no _lsn below the horizon cannot contain an expired
    # tombstone — on a tombstone-free table this returns without any Spark job
    candidates = [
        f
        for f in table.files
        if file_may_match(f, [("_deleted", "=", True), ("_lsn", "<", min_lsn_keep)])
    ]
    if not candidates:
        return None
    # ONE distributed job over the surviving files finds every file containing
    # an expired tombstone (predicate pushdown on _deleted/_lsn prunes row
    # groups; only file names of actual hits reach the driver)
    hits = (
        table.read(files=candidates, include_hidden=True)
        .filter(expired)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    dirty_paths = {
        os.path.relpath(unquote(r["f"]).removeprefix("file://"), table.path) for r in hits
    }
    dirty = [f for f in table.files if f.path in dirty_paths]
    if not dirty:
        return None
    keep = table.read(files=dirty, include_hidden=True).filter(~expired)
    return table.overwrite_partitions(
        keep, replaced=dirty, metrics={"applied": {"vacuumed_files": len(dirty)}}
    )


def compact(
    table: LakeTable, target_rows_per_file: int = 1_000_000, min_files: int = 4
) -> Commit | None:
    """Bin-pack small files: partitions whose file count exceeds what their
    row count warrants are rewritten into ~``target_rows_per_file`` files.
    The analog of Iceberg's rewrite_data_files maintenance action — run it
    periodically (the streaming runner does not need it: the arranged merge
    write already resets file granularity per rewrite, but append-heavy /
    exchange-free flows fragment over time)."""
    by_part: dict[tuple, list] = {}
    spec = table.partition_spec
    names = [p.name for p in spec]
    for f in table.files:
        by_part.setdefault(tuple(f.partition.get(n) for n in names), []).append(f)
    victims: list = []
    for _, files in by_part.items():
        rows = sum(f.rows for f in files)
        want = max(1, -(-rows // target_rows_per_file))
        if len(files) >= min_files and len(files) > want:
            victims.extend(files)
    if not victims:
        return None
    data = table.read(files=victims, include_hidden=True)
    return table.overwrite_partitions(
        data, replaced=victims, metrics={"applied": {"compacted_files": len(victims)}}
    )
