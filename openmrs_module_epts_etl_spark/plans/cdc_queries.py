"""CDC pipeline end-to-end as driver-oracle queries.

Until now the CDC core (merge/fences/changelog) was proven by pytest state
oracles only; these queries put the *whole pipeline* — derive a
deterministic change feed from the shared ``events`` table, replay it
through CdcPipeline into a real lake table in two fenced epochs, then read
the result — under the driver's DuckDB hash-comparison gate:

- ``cdc_replayed_state``: the table's visible state after full replay must
  equal the oracle's per-key max-lsn winner selection (op != 'D') — the
  reference's final-data-verification re-expressed as a query
  (api:engine/Engine.java:135-162).
- ``cdc_snapshot_diff``: the row-level changelog (cdc/changelog.py) between
  the first epoch's commit and the head must equal the oracle's full-outer
  diff of the two winner states, including update pre/post images.

The feed derivation (events → transcript mutations) is pure projection:
op flips to 'D' on 'error' events, lsn = event_id (unique, total order),
key = (conv_id, turn_idx = event_id mod 40 — forcing multi-version keys),
delivery in lsn order split into exactly two epochs at B = max_lsn/2 + 1.
The built table is cached per sf_dir so both queries (and repeated bench
passes) replay once per session.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import t

# events → change-feed projection, mirrored textually in the oracle CTE below
_TURN_MOD = 40

_FEED_SQL = f"""
WITH ev AS (
  SELECT 'c' || user_id AS conv_id,
         (event_id % {_TURN_MOD})::INT AS turn_idx,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         event_id AS lsn,
         CASE WHEN (event_id % {_TURN_MOD}) % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         concat_ws(' ', event_type, props) AS text,
         CASE WHEN event_type IN ('purchase', 'signup') THEN event_type END AS tool,
         ts
  FROM events
), b AS (SELECT max(lsn) // 2 + 1 AS cut FROM ev),
w1 AS (
  SELECT * FROM (SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) rn
    FROM ev WHERE lsn < (SELECT cut FROM b)) WHERE rn = 1),
w2 AS (
  SELECT * FROM (SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) rn
    FROM ev) WHERE rn = 1),
s1 AS (SELECT * FROM w1 WHERE op <> 'D'),
s2 AS (SELECT * FROM w2 WHERE op <> 'D')
"""


def _derived_feed(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    turn = (F.col("event_id") % _TURN_MOD).cast("int")
    return ev.select(
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("event_id").alias("lsn"),
        F.lit("events-parquet").alias("origin"),
        F.concat(F.lit("c"), F.col("user_id")).alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(turn % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
        F.concat_ws(" ", F.col("event_type"), F.col("props")).alias("text"),
        F.when(F.col("event_type").isin("purchase", "signup"), F.col("event_type")).alias("tool"),
        # the parquet testdata reads as TIMESTAMP_NTZ; the table schema is
        # session-local TimestampType — same wall-clock values (UTC session)
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_id").alias("delivery_seq"),
    )


# (table, first-epoch version, head version) per sf_dir — replay once per
# session; every query over the same sf reuses the committed table
_BUILT: dict[str, tuple] = {}


def _replayed(spark: SparkSession, sf: str):
    got = _BUILT.get(sf)
    if got is not None:
        return got
    from ..cdc import CdcPipeline, PipelineConfig, transcript_schema
    from ..lake import LakeTable, bucket, days

    feed = _derived_feed(spark, sf)
    # two epochs exactly: B = max_lsn/2 + 1 (one scalar to the driver —
    # the same bounds probe CdcPipeline itself runs)
    cut = feed.agg((F.max("lsn") / 2 + 1).cast("long")).collect()[0][0]
    root = tempfile.mkdtemp(prefix="cdc-queries-")
    LakeTable.create(
        spark, f"{root}/t", transcript_schema(), [days("ts"), bucket(8, "conv_id")]
    )
    cfg = PipelineConfig(
        table_path=f"{root}/t",
        checkpoint_dir=f"{root}/ckpt",
        batch_size=int(cut),
        fence_key="cdc-queries",
    )
    results = CdcPipeline(spark, cfg).run(feed)
    table = LakeTable(spark, f"{root}/t")
    out = (table, results[0].commit.version, results[-1].commit.version)
    _BUILT[sf] = out
    return out


def cdc_replayed_state(spark: SparkSession, sf: str) -> DataFrame:
    """Visible table state after the full two-epoch CoW replay."""
    table, _v1, _v2 = _replayed(spark, sf)
    return table.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


CDC_REPLAYED_STATE_SQL = (
    _FEED_SQL
    + """
SELECT conv_id, turn_idx, role, text, tool, ts FROM s2
"""
)


# (dst table) per sf_dir — the chained-propagation fixture below, built once
# per session like _BUILT
_FOLLOWED: dict[str, object] = {}


def _followed(spark: SparkSession, sf: str):
    """Chained propagation end-to-end: bootstrap a SECOND table to the first
    epoch's state via ``changes_as_feed(0 → v1)`` + lsn-guarded MERGE, seed a
    ``TableFollower`` checkpoint at v1, then ``poll_once`` propagates
    ``v1 → head`` through the row-level changelog (insert / update / delete
    re-emission) and the same lsn-guarded MERGE — the reference's
    stage-chaining loop (api:controller/ProcessController.java:232-270) with
    the upstream TABLE as the queue (cdc/follow.py). The final dst state must
    equal the upstream head state, which the driver checks against the same
    winner-CTE oracle as ``cdc_replayed_state``."""
    got = _FOLLOWED.get(sf)
    if got is not None:
        return got
    from ..cdc.changelog import changes_as_feed
    from ..cdc.follow import TableFollower
    from ..cdc.merge import merge_into
    from ..lake import LakeTable, bucket, days

    src, v1, _v2 = _replayed(spark, sf)
    root = tempfile.mkdtemp(prefix="cdc-follow-")
    dst = LakeTable.create(
        spark, f"{root}/dst", src.schema, [days("ts"), bucket(8, "conv_id")]
    )
    # bootstrap: the 0→v1 changelog is all-inserts of v1's winner state
    merge_into(dst, changes_as_feed(src, 0, v1), fence_key="cdc-follow-seed", epoch_id=v1)
    follower = TableFollower(
        spark, src.path, f"{root}/dst", checkpoint_dir=f"{root}/ck",
        fence_key="cdc-follow",
    )
    follower.seed_checkpoint(v1)
    follower.poll_once()  # v1 → head: updates, deletes, inserts via the diff
    # the follower commits through its own table handle; re-open at the new
    # head (a LakeTable instance pins the commit it loaded)
    dst = LakeTable(spark, f"{root}/dst")
    _FOLLOWED[sf] = dst
    return dst


def cdc_changes_replayed(spark: SparkSession, sf: str) -> DataFrame:
    """Downstream table state after chained changelog propagation
    (changes_as_feed → TableFollower → lsn-guarded MERGE); must equal the
    upstream head state."""
    dst = _followed(spark, sf)
    return dst.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def cdc_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level changelog between the first epoch's commit and the head."""
    from ..cdc.changelog import CHANGE_TYPE_COL, snapshot_diff

    table, v1, v2 = _replayed(spark, sf)
    return snapshot_diff(table, v1, v2).select(
        "conv_id",
        "turn_idx",
        F.col(CHANGE_TYPE_COL).alias("change_type"),
        F.col("_lsn").alias("lsn"),
        "text",
    )


CDC_SNAPSHOT_DIFF_SQL = (
    _FEED_SQL
    + """
, j AS (
  SELECT coalesce(s1.conv_id, w2.conv_id) AS conv_id,
         coalesce(s1.turn_idx, w2.turn_idx) AS turn_idx,
         s1.lsn a_lsn, s1.text a_text, w2.lsn b_lsn, w2.text b_text,
         s1.conv_id IS NOT NULL AS alive_a,
         w2.conv_id IS NOT NULL AND w2.op <> 'D' AS alive_b
  FROM s1 FULL OUTER JOIN w2
    ON s1.conv_id = w2.conv_id AND s1.turn_idx = w2.turn_idx)
SELECT conv_id, turn_idx, 'insert' AS change_type, b_lsn AS lsn, b_text AS text
  FROM j WHERE NOT alive_a AND alive_b
UNION ALL
-- delete = pre-image payload stamped with the deleting event's lsn
SELECT conv_id, turn_idx, 'delete', coalesce(b_lsn, a_lsn), a_text
  FROM j WHERE alive_a AND NOT alive_b
UNION ALL
SELECT conv_id, turn_idx, 'update_preimage', a_lsn, a_text
  FROM j WHERE alive_a AND alive_b AND a_lsn <> b_lsn
UNION ALL
SELECT conv_id, turn_idx, 'update_postimage', b_lsn, b_text
  FROM j WHERE alive_a AND alive_b AND a_lsn <> b_lsn
"""
)


QUERIES = {
    "cdc_replayed_state": cdc_replayed_state,
    "cdc_snapshot_diff": cdc_snapshot_diff,
    "cdc_changes_replayed": cdc_changes_replayed,
}

ORACLES = {
    "cdc_replayed_state": CDC_REPLAYED_STATE_SQL,
    "cdc_snapshot_diff": CDC_SNAPSHOT_DIFF_SQL,
    # chained propagation must land the upstream head state downstream —
    # the oracle is the same winner CTE at the head version
    "cdc_changes_replayed": CDC_REPLAYED_STATE_SQL,
}
