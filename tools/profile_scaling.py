"""Per-phase scaling profile of the MoR replay at two pinned core counts.

Answers: which phase (epoch append, compaction, driver/commit overhead)
fails to scale 2→8 cores? Run:  python tools/profile_scaling.py [cores ...]
Each level runs in-process sequentially with sched_setaffinity, same feed
size, phase walls printed as JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVENTS = int(os.environ.get("PROF_EVENTS", "4000000"))
EPOCHS = 4


def run_level(cores: int) -> dict:
    os.sched_setaffinity(0, set(range(cores)))
    from openmrs_module_epts_etl_spark.cdc import (
        CdcPipeline,
        FeedSpec,
        PipelineConfig,
        compact_latest,
        generate_feed,
        transcript_schema,
    )
    from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, days
    from openmrs_module_epts_etl_spark.session import get_spark

    work = tempfile.mkdtemp(prefix=f"prof-{cores}-", dir="/dev/shm")
    spark = get_spark(
        f"prof-{cores}", master=f"local[{cores}]", shuffle_partitions=64,
        extra_conf={"spark.local.dir": os.path.join(work, "local")},
    )
    spec = FeedSpec(
        n_events=N_EVENTS, n_convs=max(N_EVENTS // 1000, 100), max_turns=200,
        out_of_order_window=50_000, hot_key_fraction=0.3, n_hot_convs=3,
        schema_evolution_lsn=N_EVENTS // 2, text_pad_chars=160,
    )
    try:
        # warmup: small replay to absorb JIT/codegen
        wfeed = generate_feed(spark, FeedSpec(n_events=200_000, n_convs=200), 64).persist()
        wfeed.count()
        wd = os.path.join(work, "warm")
        tp = os.path.join(wd, "t")
        LakeTable.create(spark, tp, transcript_schema(), [days("ts"), bucket(16, "conv_id")])
        CdcPipeline(spark, PipelineConfig(table_path=tp, checkpoint_dir=os.path.join(wd, "ck"),
                                          batch_size=100_000, mode="mor", compact_every=4)).run(wfeed)
        wfeed.unpersist()
        shutil.rmtree(wd, ignore_errors=True)

        feed = generate_feed(spark, spec, 64).persist()
        feed.count()
        wd = os.path.join(work, "timed")
        tp = os.path.join(wd, "t")
        LakeTable.create(spark, tp, transcript_schema(), [days("ts"), bucket(16, "conv_id")])
        pipe = CdcPipeline(spark, PipelineConfig(
            table_path=tp, checkpoint_dir=os.path.join(wd, "ck"),
            batch_size=N_EVENTS // EPOCHS, mode="mor", compact_every=4))

        phases: list[tuple[str, float]] = []
        t_all = time.perf_counter()
        last = t_all

        def mark(name):
            nonlocal last
            now = time.perf_counter()
            phases.append((name, round(now - last, 3)))
            last = now

        def on_batch(epoch, res):
            mark(f"epoch{epoch}")

        pipe.run(feed, on_batch=on_batch)
        mark("run_tail")
        compact_latest(LakeTable(spark, tp), fence_key="prof-final", epoch_id=0)
        mark("final_compact")
        total = time.perf_counter() - t_all
        feed.unpersist()
        return {"cores": cores, "total": round(total, 2),
                "events_per_sec": round(N_EVENTS / total, 1), "phases": phases}
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    # JVM inherits the affinity it was launched under -> one subprocess per level
    if sys.argv[1:2] == ["--child"]:
        print(json.dumps(run_level(int(sys.argv[2]))))
        sys.exit(0)
    import subprocess
    levels = [int(a) for a in sys.argv[1:]] or [2, 8]
    for c in levels:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), "--child", str(c)],
                           capture_output=True, text=True, timeout=3600)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(line[-1] if line else r.stderr[-2000:])
