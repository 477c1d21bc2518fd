"""Custom stateful streaming operator: per-conversation progress tracking
across micro-batches via ``applyInPandasWithState``.

The reference keeps per-table operation progress in a mutable
`table_operation_progress_info` row updated as each interval completes
(api:controller/ProcessController.java:911-947;
api:model/TableOperationProgressInfo.java). The streaming analog is a
*keyed state* that survives micro-batch boundaries: per conv_id, how many
events were seen, the highest turn_idx and lsn so far, and the latest event
time. That is exactly the shape Structured Streaming's
``applyInPandasWithState`` exists for — grouped keys, explicit persistent
state, Arrow-batched (no per-row Python), checkpoint-recoverable.

Semantics: for every micro-batch, each conv_id group's pandas frames update
its ``GroupState``; one output row per touched conversation per batch carries
the *cumulative* snapshot. Downstream sinks (foreachBatch → lake append, or
memory sink in tests) receive a change-log of conversation progress — the
progress-meter feed (api:engine/EtlProgressMeter.java:39-96) with
exactly-once state recovery instead of a mutable DB row.

Scale: state is O(#live conversations) and partitioned by conv_id across
executors; each group's per-batch input is Arrow-transferred. No global
collection, no driver state.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PROGRESS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_events", LongType()),
        StructField("n_deletes", LongType()),
        StructField("max_turn_idx", IntegerType()),
        StructField("max_lsn", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)

# state tuple mirrors PROGRESS_SCHEMA minus the key
_STATE_SCHEMA = "n_events LONG, n_deletes LONG, max_turn_idx INT, max_lsn LONG, last_ts TIMESTAMP"


def _update_conversation(
    key: tuple, frames: Iterable[pd.DataFrame], state: GroupState,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events for one conv_id into its persistent state and
    emit the cumulative snapshot. Vectorized pandas per Arrow batch.

    ``ttl_ms``: idle-eviction horizon (ProcessingTimeTimeout). At 10^10
    events/day the live-conversation set grows without bound unless finished
    conversations age out; on timeout the state is dropped WITHOUT emitting —
    the last snapshot already carried the final cumulative counts, so
    downstream state is complete. A conversation that resumes after eviction
    restarts its counters from zero (callers must size the TTL past the
    conversation inactivity horizon, same sizing rule as
    ``suppress_redelivery`` in streaming/runner.py)."""
    (conv_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        n_events, n_deletes, max_turn, max_lsn, last_ts = state.get
    else:
        n_events, n_deletes, max_turn, max_lsn, last_ts = 0, 0, -1, -1, None
    for pdf in frames:
        if not len(pdf):
            continue
        n_events += int(len(pdf))
        n_deletes += int((pdf["op"] == "D").sum())
        max_turn = max(max_turn, int(pdf["turn_idx"].max()))
        max_lsn = max(max_lsn, int(pdf["lsn"].max()))
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n_events, n_deletes, max_turn, max_lsn, last_ts))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_events": [n_events],
            "n_deletes": [n_deletes],
            "max_turn_idx": [max_turn],
            "max_lsn": [max_lsn],
            "last_ts": [last_ts],
        }
    )


def conversation_progress(
    events: DataFrame, idle_ttl_minutes: int | None = None
) -> DataFrame:
    """Streaming per-conversation progress: ``events`` is a *streaming*
    DataFrame with at least (conv_id, turn_idx, op, lsn, ts). Returns the
    update-mode stream of cumulative per-conversation snapshots.

    ``idle_ttl_minutes`` bounds state at scale: conversations idle past the
    TTL are evicted (see ``_update_conversation`` for the resume caveat).
    ``None`` keeps state forever — fine for bounded tests, not for a
    10^10-event/day deployment."""
    if idle_ttl_minutes is None:
        fn, timeout = _update_conversation, GroupStateTimeout.NoTimeout
    else:
        ttl_ms = int(idle_ttl_minutes) * 60_000

        def fn(key, frames, state):  # closure, still Arrow-batched
            return _update_conversation(key, frames, state, ttl_ms=ttl_ms)

        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return events.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def progress_oracle(events_pd: pd.DataFrame) -> pd.DataFrame:
    """Batch oracle: the same cumulative snapshot computed by a plain pandas
    groupby over the full feed (what the final update per conv must equal)."""
    g = events_pd.assign(_is_delete=(events_pd["op"] == "D").astype("int64")).groupby(
        "conv_id"
    )
    out = pd.DataFrame(
        {
            "n_events": g.size(),
            "n_deletes": g["_is_delete"].sum(),
            "max_turn_idx": g["turn_idx"].max().astype("int32"),
            "max_lsn": g["lsn"].max(),
            "last_ts": g["ts"].max(),
        }
    ).reset_index()
    return out.sort_values("conv_id").reset_index(drop=True)
