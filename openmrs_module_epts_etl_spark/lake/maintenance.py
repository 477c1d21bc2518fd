"""Lake maintenance actions: snapshot expiration and orphan-file GC.

The Iceberg analogs are ``expire_snapshots`` and ``remove_orphan_files``;
the reference's analog duty is clearing its ledgers at interval end
(api:engine/Engine.java:367-406) and pruning stale interval-checkpoint files
(api:engine/record_intervals_manager/ThreadRecordIntervalsManager.java:315-354).

Two failure/retention realities force these:

- **Snapshot growth**: every commit is a full snapshot JSON; a 10^10-event
  replay producing thousands of epochs accumulates thousands of snapshots
  and the data files only they reference. Expiring all but the last K
  reclaims both — *except* the exactly-once epoch fences recorded on old
  commits, which must outlive them (a replayed epoch from last week must
  still be a no-op). Expiration therefore folds expired commits' fences into
  a sidecar (``_commits/_expired_fences.json``, atomic-rename updated) that
  ``LakeTable.epoch_already_applied`` consults alongside live history.
- **Orphan data**: a crash between ``write_data_files`` and ``commit``
  leaves a fully-written ``data/c-*`` directory no snapshot references.
  Orphan GC walks the data root and removes files unreferenced by ANY
  retained snapshot, with an mtime grace window so an in-flight writer's
  uncommitted output is never swept.

Both actions are driver-side metadata/file operations (no Spark jobs) and
single-writer, like the commit protocol itself.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from .table import _COMMITS, _DATA, LakeTable, _apply_commit_fences

_FENCE_SIDECAR = "_expired_fences.json"


def _sidecar_path(table: LakeTable) -> str:
    return os.path.join(table.path, _COMMITS, _FENCE_SIDECAR)


def load_expired_fences(table: LakeTable) -> set[tuple]:
    p = _sidecar_path(table)
    if not os.path.exists(p):
        return set()
    with open(p) as fh:
        return {tuple(e) for e in json.load(fh)}


def expire_snapshots(table: LakeTable, keep_last: int = 10) -> dict:
    """Delete all but the newest ``keep_last`` snapshots, the data files only
    they referenced, and fold their epoch fences into the sidecar. Returns
    {"expired_snapshots": n, "deleted_files": n, "kept_fences": n}.
    Time travel to expired versions is gone afterwards (that is the point).
    """
    versions = table._versions()
    if len(versions) <= keep_last:
        return {"expired_snapshots": 0, "deleted_files": 0, "kept_fences": 0}
    kept_v = versions[-keep_last:]
    expired_v = versions[: -keep_last]

    live_paths: set[str] = set()
    live_manifests: set[str] = set()
    for v in kept_v:
        kc = table._load_commit(v)
        live_paths |= {f.path for f in kc.files}
        live_manifests |= {r.path for r in kc.manifests or []}

    fences = load_expired_fences(table)
    deleted = 0
    dead_manifests: set[str] = set()
    expired = [table._load_commit(v) for v in expired_v]
    # materialize every expired commit's file list BEFORE deleting any
    # manifest page — expired snapshots share pages, and deleting one while a
    # later expired commit still resolves through it would break the loop
    for c in expired:
        c.files
    for c in expired:
        # same fold as epoch_already_applied, in version order — an expired
        # rollback commit's fence edits must survive into the sidecar exactly
        # as they would have replayed from the live log
        _apply_commit_fences(fences, c)
        for f in c.files:
            if f.path in live_paths:
                continue
            full = os.path.join(table.path, f.path)
            if os.path.exists(full):
                os.unlink(full)
                deleted += 1
        # manifest pages only expired snapshots reference go with them
        dead_manifests |= {r.path for r in c.manifests or []} - live_manifests
    for rel in dead_manifests:
        full = os.path.join(table.path, rel)
        if os.path.exists(full):
            os.unlink(full)

    # publish the fence sidecar BEFORE removing the commits it covers: a
    # crash in between leaves both sources present (fences double-counted,
    # harmless), never neither
    tmp = _sidecar_path(table) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(sorted([list(e) for e in fences]), fh)
    os.rename(tmp, _sidecar_path(table))
    for v in expired_v:
        os.unlink(os.path.join(table.path, _COMMITS, f"{v:020d}.json"))

    _prune_empty_dirs(os.path.join(table.path, _DATA))
    table._fences = None  # force fence-cache rebuild incl. sidecar
    return {
        "expired_snapshots": len(expired_v),
        "deleted_files": deleted,
        "kept_fences": len(fences),
    }


def remove_orphan_files(table: LakeTable, grace_seconds: float = 3600.0) -> int:
    """Delete data files referenced by NO retained snapshot and older than
    ``grace_seconds`` (protects an in-flight writer that has not committed
    yet). Returns the number of files removed."""
    referenced: set[str] = set()
    for v in table._versions():
        c = table._load_commit(v)
        referenced |= {f.path for f in c.files}
        referenced |= {r.path for r in c.manifests or []}
    cutoff = time.time() - grace_seconds
    removed = 0
    # orphan data files (crash between write_data_files and commit) AND
    # orphan manifest pages (an OCC-losing commit attempt's pages)
    from .table import _MANIFEST_DIR

    for root in (os.path.join(table.path, _DATA), os.path.join(table.path, _MANIFEST_DIR)):
        if not os.path.isdir(root):
            continue
        for dirpath, _dirs, names in os.walk(root):
            for n in names:
                full = os.path.join(dirpath, n)
                rel = os.path.relpath(full, table.path)
                if rel in referenced:
                    continue
                try:
                    if os.path.getmtime(full) <= cutoff:
                        os.unlink(full)
                        removed += 1
                except FileNotFoundError:
                    pass
    _prune_empty_dirs(os.path.join(table.path, _DATA))
    return removed


def _prune_empty_dirs(root: str) -> None:
    for dirpath, dirs, names in os.walk(root, topdown=False):
        if dirpath != root and not dirs and not names:
            try:
                os.rmdir(dirpath)
            except OSError:
                pass


def rollback_to_version(table: LakeTable, version: int) -> "Commit":
    """Restore the table to the state of an earlier (non-expired) snapshot as
    a NEW commit — the Iceberg ``rollback_to_snapshot`` analog, and the CDC
    operator's bad-batch escape hatch: roll the table back, fix the feed or
    transform, and replay.

    Metadata-only: no data file is read, written, or deleted — the commit's
    file list simply becomes the target snapshot's (old files are still on
    disk because a live snapshot referenced them and GC honors the whole
    retained log), and schema / partition spec revert with it.

    Exactly-once interplay — the part a naive rollback gets wrong: the
    undone epochs' (fence_key, epoch_id) fences must stop fencing, or the
    replay would skip them and leave the table stale forever. The rollback
    commit therefore records ``invalidated_fences`` = fences applied after
    the target version, and ``revalidated_fences`` = fences an intermediate
    rollback had dropped that were live at the target version (rolling back
    a rollback restores them). ``epoch_already_applied`` replays these edits
    in log order, and snapshot expiration folds them into the fence sidecar
    the same way.

    The pipeline's own checkpoint still points past the undone epochs — replay
    with a fresh ``checkpoint_dir`` (keeping ``fence_key``): un-rolled-back
    epochs stay fenced no-ops, rolled-back ones re-apply.

    Downstream chained pipelines (mor.table_changes_as_feed) CANNOT be fixed
    by this operator: a change feed has no way to express "un-apply what I
    already sent" — restored rows would re-emit with their original lsns and
    lose the downstream max-lsn contest to the already-applied bad rows. Roll
    the downstream table back explicitly (to its version from before it
    consumed the bad epochs), or run a reconciliation pass
    (operators/reconcile.py) against the restored upstream.

    Concurrency: the commit is attempted WITHOUT the usual OCC rebase
    (max_retries=0). Rebasing a rollback onto a concurrent epoch commit would
    silently publish a state that is neither the target version nor current
    (the racer's files survive, its fence stays valid, and its schema widens
    ours back). A concurrent commit therefore surfaces as CommitConflict —
    quiesce writers or simply re-run the rollback, which recomputes every set
    against the new head.

    Returns the new Commit.
    """
    import json as _json

    from pyspark.sql.types import StructType

    from .partitioning import from_json as _spec_from_json

    table.refresh()
    cur = table._commit
    if version >= cur.version:
        raise ValueError(f"rollback target v{version} is not before current v{cur.version}")
    target = table._load_commit(version)  # raises if expired/absent
    target_files = {f.path: f for f in target.files}
    missing = [p for p in target_files if not os.path.exists(os.path.join(table.path, p))]
    if missing:
        raise FileNotFoundError(
            f"cannot roll back to v{version}: {len(missing)} of its data files "
            f"no longer exist (e.g. {missing[0]})"
        )

    # fence set at the target vs now — replayed with identical semantics to
    # epoch_already_applied so nested rollbacks resolve correctly
    at_target: set[tuple] = set(load_expired_fences(table))
    at_head: set[tuple] = set(at_target)
    for v in table._versions():
        c = table._load_commit(v)
        if v <= version:
            _apply_commit_fences(at_target, c)
        _apply_commit_fences(at_head, c)
    # epoch_id may legitimately be None (fenced commits without ids), so sort
    # by a None-safe key — plain sorted() would TypeError on (key, None) vs
    # (key, 3) exactly when the escape hatch is needed
    _k = lambda e: (e[0], e[1] is not None, e[1] if e[1] is not None else 0)  # noqa: E731
    invalidated = sorted(at_head - at_target, key=_k)
    revalidated = sorted(at_target - at_head, key=_k)

    cur_paths = {f.path for f in cur.files}
    add = [f for f in target.files if f.path not in cur_paths]
    remove = cur_paths - set(target_files)
    spec_kw = {}
    if target.partition_spec != cur.partition_spec or target.spec_id != cur.spec_id:
        # restore the target's spec WITH its original spec_id: minting a new
        # id would mark every restored file as old-layout, degrading all
        # partition pruning and making migrate_layout rewrite the whole
        # restored table for nothing
        spec_kw["new_partition_spec"] = _spec_from_json(target.partition_spec)
        spec_kw["new_spec_id"] = target.spec_id
    commit = table.commit(
        add,
        remove_paths=remove,
        new_schema=StructType.fromJson(_json.loads(target.schema_json)),
        metrics={
            "operation": "rollback",
            "to_version": version,
            "invalidated_fences": [list(e) for e in invalidated],
            "revalidated_fences": [list(e) for e in revalidated],
            "restored_files": len(target_files),
            "removed_files": len(remove),
        },
        max_retries=0,  # never rebase a rollback — see docstring
        **spec_kw,
    )
    table._fences = None  # cache now stale: invalidated fences must drop
    return commit


def migrate_layout(table: LakeTable, max_files: int | None = None) -> dict:
    """Rewrite files laid out under an older partition spec into the current
    one — the cleanup half of ``LakeTable.evolve_partition_spec`` (Iceberg's
    rewrite_data_files after a spec change). Evolution itself is metadata-
    only; old files stay correct but unprunable by current-spec partition
    values, and every merge must probe them. This sweep migrates them so the
    probe set shrinks to zero.

    ``max_files`` bounds one invocation (run it incrementally from the
    maintenance cadence at 100 TB — each call is one read+arranged-write of
    just the selected old files plus one OCC swap commit; current-spec files
    are never touched).
    """
    cur = table.spec_id
    victims = [f for f in table.files if f.spec_id != cur]
    if max_files is not None:
        victims = victims[:max_files]
    if not victims:
        return {"migrated_files": 0, "remaining_old_files": 0, "rows": 0}
    data = table.read(files=victims, include_hidden=True)
    table.overwrite_partitions(
        data,
        replaced=victims,
        metrics={
            "operation": "migrate_layout",
            "migrated_files": len(victims),
            "rows": sum(f.rows for f in victims),
        },
    )
    remaining = sum(1 for f in table.files if f.spec_id != cur)
    return {
        "migrated_files": len(victims),
        "remaining_old_files": remaining,
        "rows": sum(f.rows for f in victims),
    }
