"""SparkSession factory tuned for this engine.

Defaults mirror what we'd set on a real cluster: AQE on (runtime skew-join and
coalesce), Arrow on (all pandas-UDF transfer), sane shuffle partitioning for
local testing. On a 1000-executor cluster only ``shuffle_partitions`` changes
(≈ 2-3× total cores), everything else carries over.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "epts-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master == "local[*]" and cpus:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; a real cluster would use 2-3× total executor cores.
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        shuffle_partitions = (os.cpu_count() or 8) if inner == "*" else int(inner)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Manifest-driven reads pass explicit file lists (LakeTable.read), so
        # file listing is a stat() per known path — at the default threshold
        # (32 paths) Spark runs it as a cluster JOB whose task-scheduling
        # overhead dwarfs the stats themselves (measured: 7s for 767 files on
        # 2 cores, pure fixed cost per table read). Driver-side threaded
        # listing handles thousands of paths in milliseconds on any FS; past
        # this threshold (100 TB tables → 100k+ files) the job path resumes.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
        # Shuffle/spill/broadcast transport codec. The ingest pipeline is
        # memory-bandwidth-bound at high core counts (a perfectly parallel
        # numpy streaming sum scales at only ~0.6 efficiency 2->8 cores on
        # this class of host — DRAM saturates long before the cores do, and
        # the same holds for a multi-executor node in a real cluster).
        # zstd moves ~2x fewer bytes than lz4 through that bottleneck for
        # CPU the hot levels have to spare. Measured on the 32M-event MoR
        # replay: 8-core throughput 301k -> 507k events/s (+68%), 2-core
        # 126k -> 145k, N->4N raw scaling efficiency 0.60 -> 0.87.
        .config("spark.io.compression.codec", "zstd")
        # Always use the sort-based (Unsafe) shuffle writer. Below the default
        # bypassMergeThreshold (200 reduce partitions) Spark picks the bypass
        # writer, which keeps one OPEN COMPRESSED STREAM PER REDUCE PARTITION
        # per map task — with zstd that is partitions × concurrent-tasks live
        # compression contexts (128 × 32 here), and their buffer memory +
        # context-switching throttles the whole map stage. The sort writer
        # compresses one spill stream at a time per task. Measured on the
        # 32M-event MoR replay at local[32]: 333k (zstd/bypass) -> 659k
        # events/s (zstd/sort) vs 458k for the best lz4 config. On a real
        # cluster reduce-partition counts exceed 200 anyway, so this pins the
        # cluster behavior rather than changing it.
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
        # Data-file codec stays Spark's snappy default — measured A/B at the
        # scaling-protocol shape (32M-event MoR replay, same quiet host,
        # back-to-back): snappy 129k/421k ev/s at 2/8 cores (raw N→4N 0.81)
        # vs zstd-parquet 107k/319k (raw 0.74). Unlike the shuffle transport
        # (where zstd won ~2x), parquet pages are written once and read once,
        # and zstd's encode CPU exceeds its bandwidth savings on both levels.
        # Overridable per-session for re-running that A/B.
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "snappy"),
        )
        # Accept subset-key co-partitioning for joins (hashpartitioning on
        # conv_id satisfying a join on (conv_id, turn_idx, lsn)): the default
        # TRUE exists because subset keys can concentrate skew, but it also
        # vetoes the deliberately engineered one-exchange dedupe plan
        # (cdc/dedupe.py:dedupe_latest_clustered) where the cluster column is
        # chosen to dominate the key. Only activates when both children are
        # ALREADY compatibly partitioned — plans that would shuffle anyway
        # are unaffected.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
