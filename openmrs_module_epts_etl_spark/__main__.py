"""CLI launcher: ``python -m openmrs_module_epts_etl_spark conf.json [...]``.

The reference ships a standalone launcher — ``java -jar etl.jar conf1.json
conf2.json`` (api:Main.java:12-16 → ProcessStarter → one ProcessController
per config file). This is its spark-submit analog: each config file becomes a
process (config.EtlConfig + process.ProcessRunner) driven through ONE shared
SparkSession, so on a cluster the whole invocation is

    spark-submit --py-files openmrs_module_epts_etl_spark.zip \
        -m openmrs_module_epts_etl_spark conf.json

and locally just ``python -m openmrs_module_epts_etl_spark conf.json``.

Config JSON = config.EtlConfig.from_json's shape plus optional process keys:

- ``"operations"``: [{"name", "items": [item names], "processingMode":
  "serial"|"parallel", "maxItemThreads", "children": [...]}] — the
  operation forest (api:conf/EtlOperationConfig.java). Omitted → one serial
  operation named "etl" over all items, the common single-op case.
- ``"statusDir"``: where status/stop files live (defaults to
  ``.etl-status/<processName>`` under the cwd).
- ``"runId"``: the epoch id merges are fenced with (default 0); re-running
  with the same runId converges (fenced no-ops), a new runId re-applies.

Subcommands (flags, not positional modes, so bare config paths keep the
reference's Main UX):

- ``--stop DIR``    touch the stop-request file the runner polls
  (api:controller/ProcessController.java:298-305)
- ``--status DIR``  print every operation's status file as one JSON object
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .config import EtlConfig, EtlItemConfig
from .process import OperationConfig, ProcessRunner, ProcessStopped


def _build_operations(d: dict, items: list[EtlItemConfig]) -> list[OperationConfig]:
    by_name = {it.name: it for it in items}

    def mk(op: dict) -> OperationConfig:
        wanted = op.get("items")
        missing = [n for n in (wanted or []) if n not in by_name]
        if missing:
            raise SystemExit(f"operation {op.get('name')!r} references unknown items: {missing}")
        op_type = op.get("operationType", "etl")
        if wanted is not None:
            resolved = [by_name[n] for n in wanted]
        else:
            # itemless op types (transport/load) default to no items; the
            # item-driven types default to every item, the common case
            resolved = list(items) if op_type in ("etl", "export") else []
        return OperationConfig(
            name=op["name"],
            items=resolved,
            processing_mode=op.get("processingMode", "serial"),
            max_item_threads=op.get("maxItemThreads", 4),
            children=[mk(c) for c in op.get("children", [])],
            op_type=op_type,
            options=op.get("options", {}),
        )

    ops = d.get("operations")
    if not ops:
        return [OperationConfig(name="etl", items=list(items))]
    return [mk(op) for op in ops]


def run_config_file(spark, path: str, run_id: int | None = None, status_dir: str | None = None) -> dict:
    """Run one config file as a process; returns {operation: status}."""
    with open(path) as fh:
        d = json.load(fh)
    cfg = EtlConfig.from_json(json.dumps(d))
    sdir = status_dir or d.get("statusDir") or os.path.join(".etl-status", cfg.process_name)
    rid = run_id if run_id is not None else int(d.get("runId", 0))
    runner = ProcessRunner(spark, cfg.process_name, sdir, params=cfg.params)
    return runner.run(_build_operations(d, cfg.items), run_id=rid)


def main(argv: list[str] | None = None, spark=None) -> int:
    """``spark=None`` (the CLI path) builds a session from ``--master`` and
    stops it on exit; an injected session (tests, notebooks) is left alive."""
    ap = argparse.ArgumentParser(
        prog="python -m openmrs_module_epts_etl_spark",
        description="Run config-driven ETL processes (reference Main.java analog).",
    )
    ap.add_argument("configs", nargs="*", help="process config JSON files, run in order")
    ap.add_argument("--master", default=os.environ.get("SPARK_MASTER", "local[*]"))
    ap.add_argument("--run-id", type=int, default=None, help="override the configs' runId")
    ap.add_argument("--status-dir", default=None, help="override the configs' statusDir")
    ap.add_argument("--stop", metavar="DIR", help="request a graceful stop for the process using DIR")
    ap.add_argument("--status", metavar="DIR", help="print operation statuses from DIR as JSON")
    args = ap.parse_args(argv)

    if args.stop:
        # no SparkSession needed: the stop file is plain control-plane state
        os.makedirs(args.stop, exist_ok=True)
        with open(os.path.join(args.stop, "stop"), "w") as fh:
            fh.write("stop")
        print(json.dumps({"stop_requested": args.stop}))
        return 0
    if args.status:
        out = {}
        for f in sorted(os.listdir(args.status)) if os.path.isdir(args.status) else []:
            if f.startswith("op-") and f.endswith(".json"):
                with open(os.path.join(args.status, f)) as fh:
                    out[f[3:-5]] = json.load(fh)
        print(json.dumps(out, indent=2))
        return 0
    if not args.configs:
        ap.error("no config files given (or use --stop/--status)")

    owns_session = spark is None
    if owns_session:
        from .session import get_spark

        spark = get_spark("epts-etl", master=args.master)
    try:
        statuses: dict = {}
        for path in args.configs:
            statuses[path] = run_config_file(
                spark, path, run_id=args.run_id, status_dir=args.status_dir
            )
        print(json.dumps(statuses, default=str))
        return 0
    except ProcessStopped as e:
        print(json.dumps({"stopped": str(e)}), file=sys.stderr)
        return 3
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
