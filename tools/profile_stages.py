"""Per-stage utilization of the MoR replay: where do the cores idle?

Runs one replay at a pinned core count with the Spark UI enabled, then dumps
every stage's (name, tasks, executorRunTime, wall, utilization) from the
REST API.  utilization = executorRunTime / (cores x stage wall): a stage at
0.3 utilization on 8 cores is a straggler tail or an under-parallel stage —
exactly the serial component the scaling pairs see.

Run:  python tools/profile_stages.py <cores>
Env:  PROF_EVENTS (default 8_000_000), PROF_EPOCHS (default 2),
      PROF_FEED (optional path to a pre-generated parquet feed, the bench
      scaling-pair shape: range-clustered by delivery_seq; without it the
      feed is generated in-process and persisted — NOTE the two shapes
      measure differently: the persisted 32M feed is ~5 GB of cached rows
      re-scanned per epoch, the parquet feed is ~1 GB pruned row groups),
      PROF_SPEC (bucket | mbucket, default bucket: mbucket reproduces the
      bench table spec, which activates the clustered one-exchange dedupe
      in compaction; bucket exercises the generic narrow-agg path)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVENTS = int(os.environ.get("PROF_EVENTS", "8000000"))
EPOCHS = int(os.environ.get("PROF_EPOCHS", "2"))


def main(cores: int) -> None:
    os.sched_setaffinity(0, set(range(cores)))
    from openmrs_module_epts_etl_spark.cdc import (
        CdcPipeline,
        PipelineConfig,
        compact_latest,
        generate_feed,
        transcript_schema,
    )
    from openmrs_module_epts_etl_spark.cdc.generator import FeedSpec
    from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, days, mbucket
    from openmrs_module_epts_etl_spark.session import get_spark

    work = tempfile.mkdtemp(prefix=f"profs-{cores}-", dir="/dev/shm")
    spark = get_spark(
        f"profs-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(4 * cores, 8),
        extra_conf={
            "spark.local.dir": os.path.join(work, "local"),
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
        },
    )
    spec = FeedSpec(
        n_events=N_EVENTS, n_convs=max(N_EVENTS // 1000, 100), max_turns=200,
        out_of_order_window=50_000, hot_key_fraction=0.3, n_hot_convs=3,
        schema_evolution_lsn=N_EVENTS // 2, text_pad_chars=160,
    )
    feed_path = os.environ.get("PROF_FEED")
    try:
        if feed_path:
            feed = spark.read.parquet(feed_path)
        else:
            feed = generate_feed(spark, spec, 64).persist()
            feed.count()
        # warmup
        wd = os.path.join(work, "warm")
        tp = os.path.join(wd, "t")
        bfn = mbucket if os.environ.get("PROF_SPEC") == "mbucket" else bucket
        LakeTable.create(spark, tp, transcript_schema(), [days("ts"), bfn(16, "conv_id")])
        CdcPipeline(spark, PipelineConfig(
            table_path=tp, checkpoint_dir=os.path.join(wd, "ck"),
            batch_size=N_EVENTS, mode="mor", compact_every=4)).run(feed.limit(200_000))
        shutil.rmtree(wd, ignore_errors=True)

        app_id = spark.sparkContext.applicationId
        base = f"http://localhost:4049/api/v1/applications/{app_id}"
        before = {s["stageId"] for s in json.load(urllib.request.urlopen(f"{base}/stages"))}

        wd = os.path.join(work, "timed")
        tp = os.path.join(wd, "t")
        LakeTable.create(spark, tp, transcript_schema(), [days("ts"), bfn(16, "conv_id")])
        pipe = CdcPipeline(spark, PipelineConfig(
            table_path=tp, checkpoint_dir=os.path.join(wd, "ck"),
            batch_size=N_EVENTS // EPOCHS, mode="mor", compact_every=4))
        t0 = time.perf_counter()
        pipe.run(feed)
        compact_latest(LakeTable(spark, tp), fence_key="prof-final", epoch_id=0)
        total = time.perf_counter() - t0

        stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
        execs = json.load(urllib.request.urlopen(f"{base}/executors"))
        gc_ms = sum(e.get("totalGCTime", 0) for e in execs)
        cpu_ns = sum(
            s.get("executorCpuTime", 0) for s in stages if s["stageId"] not in before
        )
        rows = []
        agg_run = 0.0
        agg_wall = 0.0
        for s in stages:
            if s["stageId"] in before:
                continue
            sub = time.strptime(s["firstTaskLaunchedTime"][:19], "%Y-%m-%dT%H:%M:%S")
            done = time.strptime(s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            wall = max(time.mktime(done) - time.mktime(sub), 0.001)
            run_s = s["executorRunTime"] / 1000.0
            agg_run += run_s
            agg_wall += wall
            rows.append({
                "id": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "wall": round(wall, 2),
                "exec_run": round(run_s, 2),
                "util": round(run_s / (cores * wall), 2),
                "in_mb": round(s.get("inputBytes", 0) / 1e6),
                "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6),
                "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6),
                "out_mb": round(s.get("outputBytes", 0) / 1e6),
                "name": s["name"].split(" at ")[0][:40],
            })
        rows.sort(key=lambda r: r["id"])
        print(json.dumps({
            "cores": cores, "total_wall": round(total, 2),
            "events_per_sec": round(N_EVENTS / total, 1),
            "sum_stage_wall": round(agg_wall, 2),
            "gap_wall": round(total - agg_wall, 2),
            "overall_util": round(agg_run / (cores * total), 2),
            "gc_sec_total_app": round(gc_ms / 1000.0, 2),
            "exec_cpu_sec": round(cpu_ns / 1e9, 2),
            "exec_run_sec": round(agg_run, 2),
        }))
        for r in rows:
            print(json.dumps(r))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
