from .joins import anti_join, filter_join, lookup_join, semi_join, shared_pk_join
from .windows import gap_buckets, latest_per_key, running_total, sessionize
from .reconcile import missing_records, outdated_records, phantom_records, reconciliation_report

__all__ = [
    "anti_join",
    "filter_join",
    "lookup_join",
    "semi_join",
    "shared_pk_join",
    "gap_buckets",
    "latest_per_key",
    "running_total",
    "sessionize",
    "missing_records",
    "outdated_records",
    "phantom_records",
    "reconciliation_report",
]
