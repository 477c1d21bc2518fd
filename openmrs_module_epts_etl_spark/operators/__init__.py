from .joins import anti_join, filter_join, lookup_join, semi_join, shared_pk_join
from .transcripts import (
    conversation_stats,
    duplicate_turn_texts,
    reassemble_conversations,
)
from .windows import gap_buckets, latest_per_key, running_total, scd2_history, sessionize
from .reconcile import missing_records, outdated_records, phantom_records, reconciliation_report

__all__ = [
    "anti_join",
    "filter_join",
    "lookup_join",
    "semi_join",
    "shared_pk_join",
    "conversation_stats",
    "duplicate_turn_texts",
    "reassemble_conversations",
    "scd2_history",
    "gap_buckets",
    "latest_per_key",
    "running_total",
    "sessionize",
    "missing_records",
    "outdated_records",
    "phantom_records",
    "reconciliation_report",
]
