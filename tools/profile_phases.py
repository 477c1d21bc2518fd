"""Fine-grained serial-vs-parallel decomposition of the MoR replay.

The scaling pairs show ~29s of the replay wall that does not shrink 2->8
cores (solve T(c) = S + P/c from the best pair's walls).  This tool wraps
every driver-side call site in the replay loop with a timer and prints
per-phase totals at each core count: phases whose totals stay flat across
core counts ARE the serial component S.

Run:  python tools/profile_phases.py [cores ...]     (default: 2 8)
Env:  PROF_EVENTS (default 8_000_000), PROF_EPOCHS (default 2)
"""

from __future__ import annotations

import functools
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVENTS = int(os.environ.get("PROF_EVENTS", "8000000"))
EPOCHS = int(os.environ.get("PROF_EPOCHS", "2"))

_TIMES: dict[str, list[float]] = {}


def _wrap(obj, name: str, label: str | None = None):
    fn = getattr(obj, name)
    key = label or name

    @functools.wraps(fn)
    def timed(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            _TIMES.setdefault(key, []).append(time.perf_counter() - t0)

    setattr(obj, name, timed)


def run_level(cores: int, feed_path: str) -> dict:
    os.sched_setaffinity(0, set(range(cores)))
    from openmrs_module_epts_etl_spark.cdc import (
        CdcPipeline,
        PipelineConfig,
        compact_latest,
        generate_feed,
        transcript_schema,
    )
    from openmrs_module_epts_etl_spark.cdc import dedupe as _dedupe_mod
    from openmrs_module_epts_etl_spark.cdc import mor as _mor_mod
    from openmrs_module_epts_etl_spark.cdc import pipeline as _pipe_mod
    from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, days
    from openmrs_module_epts_etl_spark.lake import table as _table_mod
    from openmrs_module_epts_etl_spark.session import get_spark
    from openmrs_module_epts_etl_spark.cdc.generator import FeedSpec

    _TIMES.clear()
    # instrument the replay's driver-side call sites
    _ = _dedupe_mod  # wrapped via the mor module's own binding below
    _wrap(_table_mod.LakeTable, "write_data_files")
    _wrap(_table_mod.LakeTable, "_discover_files")
    _wrap(_table_mod.LakeTable, "commit")
    _wrap(_table_mod.LakeTable, "epoch_already_applied")
    _wrap(_mor_mod, "append_delta")
    _wrap(_mor_mod, "compact_latest")
    _wrap(_mor_mod, "dedupe_latest")
    _wrap(_pipe_mod.CdcPipeline, "save_checkpoint")

    work = tempfile.mkdtemp(prefix=f"profp-{cores}-", dir="/dev/shm")
    spark = get_spark(
        f"profp-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(4 * cores, 8),
        extra_conf={"spark.local.dir": os.path.join(work, "local")},
    )
    try:
        # warmup replay (same as bench)
        wfeed = generate_feed(spark, FeedSpec(n_events=200_000, n_convs=200), 64).persist()
        wfeed.count()
        wd = os.path.join(work, "warm")
        tp = os.path.join(wd, "t")
        LakeTable.create(spark, tp, transcript_schema(), [days("ts"), bucket(16, "conv_id")])
        CdcPipeline(spark, PipelineConfig(
            table_path=tp, checkpoint_dir=os.path.join(wd, "ck"),
            batch_size=100_000, mode="mor", compact_every=4)).run(wfeed)
        wfeed.unpersist()
        shutil.rmtree(wd, ignore_errors=True)
        _TIMES.clear()  # keep only the timed region

        feed = spark.read.parquet(feed_path)
        wd = os.path.join(work, "timed")
        tp = os.path.join(wd, "t")
        LakeTable.create(spark, tp, transcript_schema(), [days("ts"), bucket(16, "conv_id")])
        pipe = CdcPipeline(spark, PipelineConfig(
            table_path=tp, checkpoint_dir=os.path.join(wd, "ck"),
            batch_size=N_EVENTS // EPOCHS, mode="mor", compact_every=4))

        t0 = time.perf_counter()
        pipe.run(feed)
        t_run = time.perf_counter() - t0
        compact_latest(LakeTable(spark, tp), fence_key="prof-final", epoch_id=0)
        total = time.perf_counter() - t0
        phases = {
            k: {"n": len(v), "total": round(sum(v), 2)} for k, v in sorted(_TIMES.items())
        }
        return {
            "cores": cores, "total": round(total, 2), "run": round(t_run, 2),
            "final_compact": round(total - t_run, 2),
            "events_per_sec": round(N_EVENTS / total, 1),
            "phases": phases,
        }
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    if sys.argv[1:2] == ["--child"]:
        print(json.dumps(run_level(int(sys.argv[2]), sys.argv[3])))
        return
    import subprocess

    from openmrs_module_epts_etl_spark.cdc import generate_feed
    from openmrs_module_epts_etl_spark.cdc.generator import FeedSpec
    from openmrs_module_epts_etl_spark.session import get_spark

    cores_list = [int(c) for c in sys.argv[1:]] or [2, 8]
    feed_dir = tempfile.mkdtemp(prefix="profp-feed-", dir="/dev/shm")
    spark = get_spark("profp-feedgen", master=f"local[{os.cpu_count()}]", shuffle_partitions=64)
    spec = FeedSpec(
        n_events=N_EVENTS, n_convs=max(N_EVENTS // 1000, 100), max_turns=200,
        out_of_order_window=50_000, hot_key_fraction=0.3, n_hot_convs=3,
        schema_evolution_lsn=N_EVENTS // 2, text_pad_chars=160,
    )
    (
        generate_feed(spark, spec, 64)
        .repartitionByRange(64, "delivery_seq")
        .write.mode("overwrite").parquet(feed_dir)
    )
    spark.stop()
    try:
        results = []
        for c in cores_list:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", str(c), feed_dir],
                capture_output=True, text=True, timeout=3600,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            if not line:
                print(out.stdout, out.stderr[-3000:], file=sys.stderr)
                continue
            results.append(json.loads(line[-1]))
            print(json.dumps(results[-1], indent=1))
        if len(results) == 2:
            a, b = results
            print("\n== phase totals (serial candidates stay flat) ==")
            for k in sorted(set(a["phases"]) | set(b["phases"])):
                ta = a["phases"].get(k, {}).get("total", 0.0)
                tb = b["phases"].get(k, {}).get("total", 0.0)
                ratio = (ta / tb) if tb else float("inf")
                print(f"{k:32s} {a['cores']}c={ta:8.2f}  {b['cores']}c={tb:8.2f}  ratio={ratio:5.2f}")
    finally:
        shutil.rmtree(feed_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
