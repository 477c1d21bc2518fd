"""Process orchestration: operations → items, serial/parallel, chained.

The reference's control plane above the per-table engines
(SURVEY.md §2.10, §3.1):

- a *process* runs a list of root *operations*; each operation runs its
  configured items SERIAL or PARALLEL (``processingMode``,
  api:controller/OperationController.java:178-323,
  api:conf/types/EtlProcessingModeType.java);
- *child operations* start when their parent finishes — operation chaining
  (api:controller/ProcessController.java:232-270);
- a *status file* per operation records state + metrics, re-saved as it runs
  (api:controller/OperationController.java:550-578);
- a *stop-request file* is polled between work units; when present the
  process winds down gracefully (api:controller/ProcessController.java:298-305,
  440-462);
- an *already-finished short-circuit* skips operations whose status file says
  FINISHED for this run id (api:controller/OperationController.java:325-356).

Spark-first restatement: items are config-driven ETL runs (config.py) whose
sinks are epoch-fenced lake commits — so the short-circuit and every resume
path are *double*-guarded: even if a status file is lost, replayed merges are
no-ops at the commit log. PARALLEL mode drives several items through one
SparkSession from a thread pool (Spark schedules concurrent jobs fine;
executor cores are the real resource) — the analog of one engine thread per
item, with the cluster scheduler replacing the reference's hand-rolled pool
(api:utilities/concurrent/ThreadPoolService.java).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .config import EtlItemConfig, run_etl_item


OPERATION_TYPES = ("etl", "export", "transport", "load", "maintenance", "follow")


@dataclass
class OperationConfig:
    """One operation: a set of items plus chained children (EtlOperationConfig).

    ``op_type`` is the EtlOperationType analog (api:conf/types/
    EtlOperationType.java), covering the file-based remote-sync lifecycle of
    SURVEY.md §3.3 as chained operations:

    - ``etl``       — src→dst merges per item (the default)
    - ``export``    — DB_QUICK_EXPORT: each item's built source frame →
                      JSON batch + manifest (options: ``exportDir``)
    - ``transport`` — TRANSPORT: move manifest-validated batches
                      (options: ``exportDir``, ``importDir``, ``backupDir``)
    - ``load``      — DATABASE_MERGE_FROM_JSON: stream the import area
                      through the fenced merge (options: ``importDir``,
                      ``tablePath``, ``key``, ``archiveDir``,
                      ``withEventColumns``)
    - ``maintenance`` — scheduled lake housekeeping: ordered ``actions``
                      from {compact, vacuum_tombstones, expire_snapshots,
                      migrate_layout, remove_orphans, rewrite_clustered}
                      against ``tablePath`` (see ``_run_maintenance``)
    - ``follow``    — propagate an upstream table's committed changes into a
                      downstream table (cdc/follow.TableFollower — the
                      table-as-feed chained stage; options: ``srcPath``,
                      ``dstPath``, ``checkpointDir``, optional ``key``,
                      ``mode`` cow|mor)
    """

    name: str
    items: list[EtlItemConfig] = field(default_factory=list)
    processing_mode: str = "serial"  # serial | parallel
    max_item_threads: int = 4        # parallel mode fan-out (maxSupportedEngines analog)
    children: list["OperationConfig"] = field(default_factory=list)
    op_type: str = "etl"
    options: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.processing_mode not in ("serial", "parallel"):
            raise ValueError(f"processingMode must be serial|parallel, got {self.processing_mode!r}")
        if self.op_type not in OPERATION_TYPES:
            raise ValueError(f"operationType must be one of {OPERATION_TYPES}, got {self.op_type!r}")


class ProcessStopped(RuntimeError):
    """A stop request was honored; partial state is consistent (fenced commits)."""


class ProcessRunner:
    """Run a process = forest of operations with chaining, status, stop."""

    def __init__(
        self,
        spark: SparkSession,
        process_name: str,
        status_dir: str,
        params: dict | None = None,
    ):
        self.spark = spark
        self.process_name = process_name
        self.status_dir = status_dir
        # global configuration parameters — @param binding source shared by
        # every item this process runs (README.md:258-260)
        self.params = params or {}
        os.makedirs(status_dir, exist_ok=True)

    # ------------------------------------------------------------ status I/O
    def _status_path(self, op: OperationConfig) -> str:
        return os.path.join(self.status_dir, f"op-{op.name}.json")

    def _load_status(self, op: OperationConfig) -> dict:
        p = self._status_path(op)
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
        return {}

    def _save_status(self, op: OperationConfig, status: dict) -> None:
        p = self._status_path(op)
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(status, fh)
        os.rename(tmp, p)  # atomic publish, same trick as the commit log

    def stop_requested(self) -> bool:
        return os.path.exists(os.path.join(self.status_dir, "stop"))

    def request_stop(self) -> None:
        """The analog of the reference's stop file touched by an operator."""
        with open(os.path.join(self.status_dir, "stop"), "w") as fh:
            fh.write(str(time.time()))

    # ------------------------------------------------------------------ run
    def run(self, operations: list[OperationConfig], run_id: int = 0) -> dict:
        """Run root operations in order; each operation's children chain after
        it. Returns {op_name: status}. ``run_id`` doubles as the epoch id the
        item merges are fenced with, so a killed/re-run process converges to
        the same table state no matter where it died.
        """
        out: dict = {}
        for op in operations:
            self._run_operation(op, run_id, out)
        return out

    def _run_operation(self, op: OperationConfig, run_id: int, out: dict) -> None:
        if self.stop_requested():
            raise ProcessStopped(f"stop requested before operation {op.name!r}")
        status = self._load_status(op)
        if status.get("state") == "FINISHED" and status.get("run_id") == run_id:
            # already-finished short-circuit; the commit-log fence would make a
            # re-run harmless anyway, this just avoids replanning the no-ops
            out[op.name] = status
        else:
            status = {"state": "RUNNING", "run_id": run_id, "started": time.time(), "items": {}}
            self._save_status(op, status)

            def run_item(item: EtlItemConfig) -> tuple[str, dict]:
                if self.stop_requested():
                    return item.name, {"stopped": True}
                if op.op_type == "export":
                    return item.name, self._export_item(op, item, run_id)
                fence = f"{self.process_name}:{op.name}:{item.name}"
                return item.name, run_etl_item(
                    self.spark, item, epoch_id=run_id, fence_prefix=fence,
                    params=self.params,
                )

            results: list[tuple[str, dict]] = []
            try:
                if op.op_type == "transport":
                    results.append(("transport", self._run_transport(op)))
                elif op.op_type == "load":
                    results.append(("load", self._run_load(op)))
                elif op.op_type == "maintenance":
                    results.append(("maintenance", self._run_maintenance(op)))
                elif op.op_type == "follow":
                    results.append(("follow", self._run_follow(op)))
                elif op.processing_mode == "parallel" and len(op.items) > 1:
                    with ThreadPoolExecutor(max_workers=op.max_item_threads) as ex:
                        futures = [ex.submit(run_item, item) for item in op.items]
                        for fut in as_completed(futures):
                            results.append(fut.result())
                            # per-item progress in parallel mode too, so a
                            # monitoring consumer sees completions as they land
                            self._save_status(
                                op, {**status, "items": {k: _summ(v) for k, v in results}}
                            )
                else:
                    for item in op.items:
                        results.append(run_item(item))
                        self._save_status(
                            op, {**status, "items": {k: _summ(v) for k, v in results}}
                        )
            except Exception as e:
                # never leave the status file claiming RUNNING after a crash —
                # a monitor must be able to tell a dead run from a live one
                self._save_status(
                    op,
                    {
                        "state": "FAILED",
                        "run_id": run_id,
                        "finished": time.time(),
                        "error": repr(e),
                        "items": {k: _summ(v) for k, v in results},
                    },
                )
                raise
            stopped = [k for k, v in results if v.get("stopped")]
            status = {
                "state": "STOPPED" if stopped else "FINISHED",
                "run_id": run_id,
                "finished": time.time(),
                "items": {k: _summ(v) for k, v in results},
            }
            self._save_status(op, status)
            out[op.name] = status
            if stopped:
                raise ProcessStopped(f"stop requested during operation {op.name!r}")
        # chaining: children start only after the parent finished
        for child in op.children:
            self._run_operation(child, run_id, out)

    # ------------------------------------------------ file-sync operations
    def _export_item(self, op: OperationConfig, item: EtlItemConfig, run_id: int) -> dict:
        """DB_QUICK_EXPORT: the item's built source frame → one JSON batch +
        manifest, atomically published. Batch tags carry the run id, so a
        re-run of the same run id skips already-published batches (the
        export-side idempotence analog of the merge fence)."""
        from .config import build_item_frame
        from .sources.files import json_export

        out_dir = op.options["exportDir"]
        tag = f"{item.name}-r{run_id}"
        if os.path.exists(os.path.join(out_dir, tag)):
            return {"skipped": True, "batch": tag}
        return json_export(build_item_frame(self.spark, item, self.params), out_dir, tag)

    def _run_follow(self, op: OperationConfig) -> dict:
        """Table→table change propagation as a chained operation: poll the
        upstream commit log until caught up. Re-running after a crash is safe
        — each poll's downstream commit is fenced by the upstream head
        version (cdc/follow.py), so a replayed interval is a no-op."""
        from .cdc.follow import TableFollower

        o = op.options
        follower = TableFollower(
            self.spark,
            o["srcPath"],
            o["dstPath"],
            o["checkpointDir"],
            key=o.get("key"),
            fence_key=o.get("fenceKey", f"{self.process_name}:{op.name}"),
            mode=o.get("mode", "cow"),
        )
        results = follower.run_until_caught_up()
        return {
            "polls": len(results),
            "skipped": sum(1 for r in results if r.skipped_epoch),
            "applied": [r.applied for r in results if r.applied],
            "last_propagated": follower.last_propagated(),
        }

    def _run_maintenance(self, op: OperationConfig) -> dict:
        """Scheduled lake maintenance as a chained operation (the analog of
        the reference's post-ETL housekeeping processes — ledger pruning,
        DATABASE_PREPARATION-style DDL passes). ``options``:

        - ``tablePath`` (required) and ``actions``: ordered subset of
          {compact, compact_partitions, vacuum_tombstones, expire_snapshots,
          migrate_layout, remove_orphans, rewrite_clustered};
        - per-action kwargs under the action's name, camelCase keys
          converted verbatim (e.g. ``{"rewrite_clustered": {"columns":
          ["conv_id"]}}``, ``{"vacuum_tombstones": {"min_lsn_keep": N}}``).

        Each action is fenced/idempotent at the table layer (OCC commits,
        no-op when nothing qualifies), so re-running the operation after a
        crash is safe — same property as every other op_type here."""
        from .cdc.merge import compact, vacuum_tombstones
        from .cdc.mor import compact_partitions
        from .lake import (
            LakeTable,
            expire_snapshots,
            migrate_layout,
            remove_orphan_files,
            rewrite_clustered,
        )

        o = op.options
        table = LakeTable(self.spark, o["tablePath"])
        runners = {
            "compact": lambda kw: {"committed": compact(table, **kw) is not None},
            "compact_partitions": lambda kw: {
                "committed": compact_partitions(table, **kw) is not None
            },
            "vacuum_tombstones": lambda kw: {
                "committed": vacuum_tombstones(table, **kw) is not None
            },
            "expire_snapshots": lambda kw: expire_snapshots(table, **kw),
            "migrate_layout": lambda kw: migrate_layout(table, **kw),
            "remove_orphans": lambda kw: {
                "removed": remove_orphan_files(table, **kw)
            },
            "rewrite_clustered": lambda kw: rewrite_clustered(table, **kw),
        }
        out: dict = {}
        for action in o.get("actions", []):
            if action not in runners:
                raise ValueError(
                    f"unknown maintenance action {action!r}; use {sorted(runners)}"
                )
            if self.stop_requested():
                out[action] = {"stopped": True}
                break
            out[action] = runners[action](o.get(action, {}))
            table.refresh()
        return out

    def _run_transport(self, op: OperationConfig) -> dict:
        from .sources.files import transport_batches

        o = op.options
        moved = transport_batches(
            o["exportDir"], o["importDir"], backup_dir=o.get("backupDir")
        )
        return {"moved": [m["batch"] for m in moved], "rows": sum(m["rows"] for m in moved)}

    def _run_load(self, op: OperationConfig) -> dict:
        """DATABASE_MERGE_FROM_JSON: stream the import area through the
        fenced merge (json_load_stream → foreachBatch merge_into). The read
        schema derives from the destination table's payload columns plus the
        change-event columns (op/lsn/origin) unless ``withEventColumns`` is
        false; missing event columns are synthesized exactly like
        run_etl_item's plain-upsert adaptation."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        from .cdc.merge import merge_into
        from .lake.table import LakeTable
        from .sources.files import json_load_stream

        o = op.options
        table = LakeTable(self.spark, o["tablePath"])
        key = o.get("key", ["conv_id", "turn_idx"])
        fields = [f for f in table.schema.fields if not f.name.startswith("_")]
        if o.get("withEventColumns", True):
            fields = [
                StructField("op", StringType()),
                StructField("lsn", LongType()),
                StructField("origin", StringType()),
            ] + fields
        ck = o.get("checkpointDir") or os.path.join(self.status_dir, f"load-ck-{op.name}")
        reader = json_load_stream(
            self.spark, o["importDir"], StructType(fields), ck,
            archive_dir=o.get("archiveDir"),
        )
        # Fence namespace is tied to the CHECKPOINT INSTANCE (uuid sidecar
        # created with the checkpoint), not just the op name: streaming
        # epoch_ids restart at 0 under a fresh/relocated checkpoint, and a
        # fixed fence would collide new batches with last run's fences —
        # silently never applying them. A fresh instance re-merges everything
        # the source re-reads instead, which the lsn guard makes row-level
        # idempotent: re-applying is safe, dropping is not.
        os.makedirs(ck, exist_ok=True)
        inst_path = os.path.join(ck, "_fence_instance")
        if not os.path.exists(inst_path):
            tmp = inst_path + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                fh.write(uuid.uuid4().hex[:16])
            os.rename(tmp, inst_path)
        with open(inst_path) as fh:
            instance = fh.read().strip()
        fence = f"{self.process_name}:{op.name}:{instance}"
        batches: list[dict] = []

        def apply(batch_df, epoch_id: int) -> None:
            batch = batch_df
            if "op" not in batch.columns:
                batch = batch.withColumn("op", F.lit("I"))
            if "lsn" not in batch.columns:
                batch = batch.withColumn("lsn", F.lit(int(epoch_id)).cast("long"))
            if "origin" not in batch.columns:
                batch = batch.withColumn("origin", F.lit(op.name))
            res = merge_into(
                LakeTable(batch_df.sparkSession, o["tablePath"]), batch, key=key,
                fence_key=fence, epoch_id=int(epoch_id),
            )
            batches.append(
                {"applied": res.applied, "skipped_epoch": bool(res.skipped_epoch)}
            )

        q = (
            reader.writeStream.foreachBatch(apply)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(int(o.get("awaitSeconds", 600)))
        if not finished:
            # a load slower than the deadline must surface as FAILED, not be
            # reported FINISHED with partial batches while the query races on
            q.stop()
            raise TimeoutError(
                f"load {op.name!r} did not finish within "
                f"{o.get('awaitSeconds', 600)}s ({len(batches)} batches applied)"
            )
        return {"table": table.path, "batches": batches}


def _summ(v: dict) -> dict:
    """JSON-safe summary of a run_etl_item result for the status file."""
    return {k: (dict(val) if isinstance(val, dict) else val) for k, val in v.items()}
