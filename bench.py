"""Benchmark harness.

Two parts:

1. **CDC replay throughput** (the BASELINE.json north rule): replay an
   identical deterministically-generated change feed through the full
   pipeline (dedupe → lsn-guarded MERGE → lake commit) at two parallelism
   levels — local[N] and local[4N] — and report events/sec at both plus the
   scaling efficiency  eff = throughput_4N / (4 × throughput_N).
2. **Headline queries** at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
   on local[$SPARK_GRAFT_CPUS]: per-query wall seconds, forced through a
   noop write so the whole plan executes.

Prints ONE JSON line; also refreshes BENCH.md with the scaling table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _mk_spark(cores: int, app: str):
    from openmrs_module_epts_etl_spark.session import get_spark

    return get_spark(app, master=f"local[{cores}]", shuffle_partitions=max(cores * 2, 8))


def bench_cdc(cores: int, n_events: int, work_root: str) -> dict:
    from openmrs_module_epts_etl_spark.cdc import (
        CdcPipeline,
        FeedSpec,
        PipelineConfig,
        generate_feed,
        transcript_schema,
    )
    from openmrs_module_epts_etl_spark.lake import LakeTable, bucket, days

    spark = _mk_spark(cores, f"cdc-bench-{cores}")
    try:
        spec = FeedSpec(
            n_events=n_events,
            n_convs=max(n_events // 1000, 100),
            max_turns=200,
            out_of_order_window=50_000,
            hot_key_fraction=0.3,
            n_hot_convs=3,
            schema_evolution_lsn=n_events // 2,
            text_pad_chars=160,
        )
        # identical input at every parallelism: fixed generation partitioning
        feed = generate_feed(spark, spec, num_partitions=64).persist()
        feed.count()  # materialize outside the timed region

        work = os.path.join(work_root, f"cdc-{cores}")
        tpath = os.path.join(work, "transcripts")
        LakeTable.create(
            spark, tpath, transcript_schema(), [days("ts"), bucket(16, "conv_id")]
        )
        pipe = CdcPipeline(
            spark,
            PipelineConfig(
                table_path=tpath,
                checkpoint_dir=os.path.join(work, "ck"),
                batch_size=max(n_events // 4, 10_000),
            ),
        )
        t0 = time.perf_counter()
        results = pipe.run(feed)
        wall = time.perf_counter() - t0
        feed.unpersist()
        applied = {}
        for r in results:
            for k, v in r.applied.items():
                applied[k] = applied.get(k, 0) + v
        return {
            "cores": cores,
            "events": n_events,
            "wall_sec": round(wall, 2),
            "events_per_sec": round(n_events / wall, 1),
            "epochs": len(results),
            "applied": applied,
        }
    finally:
        spark.stop()


HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "latest_event_per_user",
    "user_sessions",
    "doc_quality",
    "exact_dup_groups",
    "minhash_signatures_16",
    "simhash_near_dups",
    "ann_cosine_topk",
    "label_centroids",
]


def bench_queries(sf_dir: str, cores: int) -> dict[str, float]:
    from openmrs_module_epts_etl_spark.plans import QUERIES

    spark = _mk_spark(cores, "query-bench")
    out = {}
    try:
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 3)
    finally:
        spark.stop()
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "1000000"))
    n_small = max(cpus // 4, 1)

    work_root = tempfile.mkdtemp(prefix="cdc-bench-")
    try:
        lo = bench_cdc(n_small, n_events, work_root)
        hi = bench_cdc(cpus, n_events, work_root)
    finally:
        shutil.rmtree(work_root, ignore_errors=True)
    efficiency = round(hi["events_per_sec"] / (4.0 * lo["events_per_sec"]), 3)

    queries = bench_queries(sf_dir, cpus)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "cdc_events_per_sec_local%d" % cpus,
        "value": hi["events_per_sec"],
        "unit": "events/sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "scaling": {
            f"local[{lo['cores']}]": lo,
            f"local[{hi['cores']}]": hi,
            "efficiency_N_to_4N": efficiency,
        },
    }

    qrows = "".join(f"| {k} | {v} |\n" for k, v in queries.items())
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as fh:
        fh.write(
            f"""# BENCH — measured locally by bench.py

## CDC replay throughput (north rule: two parallelism levels, identical input)

| parallelism | events | wall (s) | events/sec |
|---|---|---|---|
| local[{lo['cores']}] | {lo['events']} | {lo['wall_sec']} | {lo['events_per_sec']} |
| local[{hi['cores']}] | {hi['events']} | {hi['wall_sec']} | {hi['events_per_sec']} |

**Scaling efficiency N→4N: {efficiency}** (target >= 0.8 per BASELINE.json)

Feed: {n_events} events, 30 percent hot-key skew on 3 conversations,
out-of-order window 50k, mid-stream schema evolution at the halfway lsn,
deletes+reinserts included.

## Headline queries (sf={sf}, local[{cpus}]) — seconds

| query | sec |
|---|---|
{qrows}"""
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
