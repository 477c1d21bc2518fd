from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import (
    cdc_queries,
    config_queries,
    events_queries,
    ops_queries,
    text_queries,
    tpch,
    transcript_queries,
    vector_queries,
)

QUERIES = {}
ORACLES = {}
# Registration order matters: the external driver samples the FIRST 50
# registered queries for its correctness artifact. The transcript payload
# and the newest/least-proven operators go first; tpch goes last so a cap
# trims redundant classic shapes, not novel operators.
for mod in (
    cdc_queries,
    transcript_queries,
    events_queries,
    text_queries,
    vector_queries,
    ops_queries,
    config_queries,
    tpch,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's signature move on the shared testdata: CDC-style per-key
    winner selection over the events stream (max-lsn dedupe — the same
    operator that fronts every MERGE)."""
    return events_queries.latest_event_per_user(spark, sf_dir)
