"""A/B profile of the streaming topology (readStream → foreachBatch MoR).

Round-3 regression hunt: BENCH_r02 measured 311k ev/s, BENCH_r03 196k on the
same protocol. The suspected per-slice persist (VERDICT r3) is INACTIVE in the
benched topology (stream_child passes no max_offsets_per_trigger), so the tax
must be in session defaults or the MoR path changes. This script measures the
identical stream_child shape under config toggles, one JSON line per variant.

Usage: python tools/stream_ab.py [n_events] [variant ...]
Variants: base, no_minpart, lz4, bypass200, no_compact
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

VARIANTS = {
    "base": {},
    # 32 = the Spark default floor (defaultParallelism at local[32]) — i.e.
    # the pre-r3 behavior, vs the session's 4×cores=128. A literal "0" is
    # rejected/pathological (observed: a stage wedged minutes at 63/64).
    "no_minpart": {"spark.sql.files.minPartitionNum": "32"},
    "lz4": {"spark.io.compression.codec": "lz4"},
    "bypass200": {"spark.shuffle.sort.bypassMergeThreshold": "200"},
    "no_minpart_lz4": {
        "spark.sql.files.minPartitionNum": "32",
        "spark.io.compression.codec": "lz4",
    },
    # candidate streaming profile: micro-batch shuffles are small and ≤~200
    # partitions, so the bypass writer always wins; micro-batch scans are
    # small files, so the 4×cores scan floor is pure task overhead
    "stream_profile": {
        "spark.shuffle.sort.bypassMergeThreshold": "200",
        "spark.sql.files.minPartitionNum": "32",
    },
    "stream_profile_lz4": {
        "spark.shuffle.sort.bypassMergeThreshold": "200",
        "spark.sql.files.minPartitionNum": "32",
        "spark.io.compression.codec": "lz4",
    },
}


def run_variant(name: str, n_events: int, compact: bool = True) -> dict:
    from openmrs_module_epts_etl_spark.cdc import generate_feed, transcript_schema
    from openmrs_module_epts_etl_spark.lake import LakeTable, days, mbucket
    from openmrs_module_epts_etl_spark.session import get_spark
    from openmrs_module_epts_etl_spark.streaming import StreamingCdcRunner

    work = tempfile.mkdtemp(prefix=f"stream-ab-{name}-", dir="/dev/shm")
    extra = dict(VARIANTS.get(name, {}))
    extra["spark.local.dir"] = os.path.join(work, "local")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)))
    spark = get_spark(f"stream-ab-{name}", master=f"local[{cpus}]",
                      shuffle_partitions=64, extra_conf=extra)
    try:
        def one(n, files, tag):
            from bench import _feed_spec

            fd = os.path.join(work, f"feed-{tag}")
            generate_feed(spark, _feed_spec(n), 64).drop("delivery_seq").repartition(
                files
            ).write.parquet(fd)
            tp = os.path.join(work, f"t-{tag}")
            LakeTable.create(spark, tp, transcript_schema(),
                             [days("ts"), mbucket(16, "conv_id")])
            r = StreamingCdcRunner(
                spark, fd, spark.read.parquet(fd).schema, tp,
                os.path.join(work, f"ck-{tag}"), max_files_per_trigger=4,
                mode="mor", compact_every=4 if compact else None,
            )
            t0 = time.perf_counter()
            res = r.run_available_now()
            return time.perf_counter() - t0, len(res)

        one(200_000, 4, "warm")
        wall, batches = one(n_events, 16, "timed")
        return {"variant": name, "events": n_events, "wall_sec": round(wall, 2),
                "events_per_sec": round(n_events / wall, 1), "batches": batches}
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    names = sys.argv[2:] or list(VARIANTS)
    for nm in names:
        compact = nm != "no_compact"
        vn = "base" if nm == "no_compact" else nm
        r = run_variant(vn, n, compact=compact)
        if nm == "no_compact":
            r["variant"] = "no_compact"
        print(json.dumps(r), flush=True)
