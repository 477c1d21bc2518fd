"""openmrs_module_epts_etl_spark — a from-scratch PySpark-native CDC /
incremental-ingest engine with the query and data-processing capabilities of
milton-mufume/openmrs-module-epts-etl (reference at /root/reference, read-only).

The reference is a config-driven, JDBC-based, multi-threaded DB-to-DB sync/CDC
engine (see SURVEY.md). This package re-expresses its semantics Spark-first:

- ``lake``       — a minimal ACID table format over parquet (atomic JSON commit
                   log, snapshot isolation, partition-level copy-on-write,
                   additive schema evolution, epoch fencing). Stands in for
                   Iceberg (no lakehouse jars in this environment); the API is
                   deliberately Iceberg-shaped (MERGE, snapshots, time travel).
- ``cdc``        — the change-feed pipeline: deterministic transcript-mutation
                   generator, per-key max-lsn dedupe (map-side combining, skew
                   safe), lsn-guarded MERGE, checkpointed micro-batch runner,
                   lineage + metrics.
- ``streaming``  — Structured Streaming wrapper (readStream → foreachBatch with
                   epoch fencing) over the same apply path.
- ``operators``  — relational operators mirroring SURVEY.md §2 (anti/semi joins,
                   window dedupe, gap detection, reconciliation detectors).
- ``functions``  — text analysis, dedup families (exact/minhash/simhash/ngram),
                   vector similarity. Vectorized (native expressions or pandas
                   UDFs); no per-row Python.
- ``plans``      — the query library exposed through __spark_entry__.py.
- ``config``     — the reference's JSON-config UX (field mappings, lookups,
                   transformers, multi-destination fan-out, conflict policies).
- ``process``    — process control plane: operations → items serial/parallel,
                   chained child operations, status files, stop/resume.
"""

__version__ = "0.1.0"
