"""CDC-shaped and window/streaming-shaped queries over the ``events`` table
(event_id ≈ lsn, user_id ≈ key) — the SQL-expressible faces of the engine's
change-feed operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import davg, dsum, t


def latest_event_per_user(spark: SparkSession, sf: str) -> DataFrame:
    """The CDC dedupe stage itself (chooseMostRecent → narrow max + semi
    join-back, cdc/dedupe.py) applied to the events stream: last event per
    user by event_id."""
    from ..cdc.dedupe import dedupe_latest

    ev = t(spark, sf, "events").select("event_id", "user_id", "event_type", "value", "ts")
    out = dedupe_latest(ev, key=["user_id"], order_col="event_id")
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.round("value", 6).alias("last_value"),
    )


LATEST_EVENT_SQL = """
WITH r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       ROUND(value, 6) AS last_value
FROM r WHERE rn = 1
"""


def event_type_stats(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(F.col("value"), 6).alias("total_value"),
        davg(F.col("value"), 6).alias("avg_value"),
    )


EVENT_TYPE_STATS_SQL = """
SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
  (SUM(value::DECIMAL(28,6)))::DOUBLE AS total_value,
  (SUM(value::DECIMAL(28,6)))::DOUBLE / COUNT(value) AS avg_value
FROM events GROUP BY event_type
"""


def user_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows without streaming: 30-min-gap sessionization
    (operators/windows.sessionize), then per-user session stats."""
    from ..operators.windows import sessionize

    ev = t(spark, sf, "events").select("user_id", "ts", "event_id")
    s = sessionize(ev, "user_id", "ts", gap_seconds=1800)
    return s.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


USER_SESSIONS_SQL = """
WITH lagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000 THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, SUM(new_s)::BIGINT AS n_sessions, COUNT(*) AS n_events
FROM lagged GROUP BY user_id
"""


def session_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Native session windows (operators/windows.session_window_stats —
    F.session_window): per-user sessions with their [start, last+gap) bounds.
    The streaming-capable twin of ``user_sessions``; boundary pinned by
    test_streaming.py: an event exactly at prev_ts + gap still MERGES (a new
    session needs a gap strictly greater), matching ``user_sessions``'s
    ``> 1800s`` rule."""
    from ..operators.windows import session_window_stats

    ev = t(spark, sf, "events").select("user_id", "ts")
    return session_window_stats(ev, ["user_id"], "ts", gap="30 minutes")


SESSION_WINDOW_SQL = """
WITH lagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000 THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagged
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


def running_value_per_user(spark: SparkSession, sf: str) -> DataFrame:
    """Running total window (progress-meter accumulation shape, §2.4)."""
    from ..operators.windows import running_total

    ev = t(spark, sf, "events").select("user_id", "event_id", F.col("value").cast("decimal(28,6)").alias("v"))
    out = running_total(ev, ["user_id"], "event_id", "v", alias="running_value")
    return out.select(
        "user_id", "event_id", F.col("running_value").cast("double").alias("running_value")
    )


RUNNING_VALUE_SQL = """
SELECT user_id, event_id,
  (SUM(value::DECIMAL(28,6)) OVER (PARTITION BY user_id ORDER BY event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS running_value
FROM events
"""


def hourly_event_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling event-time window as a batch groupBy (the streaming windowed
    agg's batch twin — streaming/runner.py runs the readStream version)."""
    ev = t(spark, sf, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(F.count("*").alias("n"))


HOURLY_EVENTS_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""

def user_state_scd2(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 history of each user's event_type "state": consecutive same-type
    events collapse into one validity interval (operators/windows.scd2_history
    — two per-key windows, no global sort)."""
    from ..operators.windows import scd2_history

    e = t(spark, sf, "events")
    return scd2_history(
        e, keys=["user_id"], order_cols=["ts", "event_id"], tracked=["event_type"]
    )


USER_STATE_SCD2_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), kept AS (
  SELECT user_id, event_id, ts, event_type FROM o
  WHERE prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM kept
"""


QUERIES = {
    "latest_event_per_user": latest_event_per_user,
    "user_state_scd2": user_state_scd2,
    "event_type_stats": event_type_stats,
    "user_sessions": user_sessions,
    "session_window_agg": session_window_agg,
    "running_value_per_user": running_value_per_user,
    "hourly_event_counts": hourly_event_counts,
}

ORACLES = {
    "latest_event_per_user": LATEST_EVENT_SQL,
    "user_state_scd2": USER_STATE_SCD2_SQL,
    "event_type_stats": EVENT_TYPE_STATS_SQL,
    "user_sessions": USER_SESSIONS_SQL,
    "session_window_agg": SESSION_WINDOW_SQL,
    "running_value_per_user": RUNNING_VALUE_SQL,
    "hourly_event_counts": HOURLY_EVENTS_SQL,
}
