"""Contracts: the transcript table and its change feed.

Shapes come from BASELINE.json ``input_hint`` and the reference's change-event
structure (api:changedrecordsdetector/model/DetectedRecordInfo.java:24-49 —
table/record-id/uuid/operation_date/op I|U|D/origin) plus the stage-record
columns (api:conf/interfaces/TableConfiguration.java:2423-2463).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_KEY = ["conv_id", "turn_idx"]

# Payload columns shared by table rows and I/U events.
_BASE_PAYLOAD = [
    StructField("role", StringType()),
    StructField("text", StringType()),
    StructField("tool", StringType()),
    StructField("ts", TimestampType()),
]

# Additive evolution columns that appear mid-stream (FIXTURES.md §1).
EVOLVED_PAYLOAD = [
    StructField("tool_version", StringType()),
    StructField("meta_tokens", IntegerType()),
]

_KEY_FIELDS = [
    StructField("conv_id", StringType(), nullable=False),
    StructField("turn_idx", IntegerType(), nullable=False),
]


def transcript_schema(evolved: bool = False, hidden: bool = True) -> StructType:
    """Target table schema. Hidden columns: ``_lsn`` (last applied event lsn —
    the MERGE staleness guard, analog of observationDateFields newer-wins,
    api:model/EtlDatabaseObject.java:677-714) and ``_origin`` (lineage,
    analog of record_origin_location_code).
    """
    fields = list(_KEY_FIELDS) + list(_BASE_PAYLOAD)
    if evolved:
        fields += list(EVOLVED_PAYLOAD)
    if hidden:
        fields += [
            StructField("_lsn", LongType()),
            StructField("_origin", StringType()),
            # Tombstone flag: deletes persist as lsn-stamped tombstones so the
            # staleness guard holds across epochs (an out-of-order insert with
            # a lower lsn must NOT resurrect a deleted key). GC'd by vacuum
            # once older than the out-of-order horizon.
            StructField("_deleted", BooleanType()),
        ]
    return StructType(fields)


def event_schema(evolved: bool = False) -> StructType:
    fields = [
        StructField("lsn", LongType(), nullable=False),
        StructField("op", StringType(), nullable=False),  # I / U / D
    ] + list(_KEY_FIELDS) + list(_BASE_PAYLOAD)
    if evolved:
        fields += list(EVOLVED_PAYLOAD)
    fields += [StructField("origin", StringType())]
    return StructType(fields)


EVENT_SCHEMA = event_schema(False)
EVENT_SCHEMA_EVOLVED = event_schema(True)


def payload_columns(schema: StructType) -> list[str]:
    """Event columns that map to table payload (everything but lsn/op/origin)."""
    skip = {"lsn", "op", "origin"}
    return [f.name for f in schema.fields if f.name not in skip]
