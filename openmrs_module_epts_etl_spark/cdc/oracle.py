"""Independent expected-state oracle for the CDC pipeline (FIXTURES.md §3).

Per (conv_id, turn_idx): take the max-lsn event; if its op ∈ {I,U} the row
exists with that payload, if D it does not. Mirrors the reference's
stage-winner rule (api:common/model/EtlStageRecordVO.java:398-418) and the
final-verification anti-join
(api:etl/model/EtlDatabaseObjectSearchParams.java:139-164). Computed with
DuckDB/pandas — a codebase-independent reduction used by pytest.
"""

from __future__ import annotations

import pandas as pd


def expected_state_sql(events_parquet_glob: str, payload_cols: list[str]) -> str:
    cols = ", ".join(payload_cols)
    return f"""
        WITH ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
            ) AS rn
            FROM read_parquet('{events_parquet_glob}')
        )
        SELECT conv_id, turn_idx, {cols}, lsn AS _lsn, origin AS _origin
        FROM ranked WHERE rn = 1 AND op IN ('I', 'U')
        ORDER BY conv_id, turn_idx
    """


def expected_state_pandas(events: pd.DataFrame, payload_cols: list[str]) -> pd.DataFrame:
    winners = (
        events.sort_values("lsn")
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .tail(1)
    )
    alive = winners[winners["op"].isin(["I", "U"])]
    out = alive[["conv_id", "turn_idx", *payload_cols]].copy()
    out["_lsn"] = alive["lsn"].values
    out["_origin"] = alive["origin"].values
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
