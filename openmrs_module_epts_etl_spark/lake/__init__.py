from .clustering import rewrite_clustered
from .maintenance import (
    expire_snapshots,
    migrate_layout,
    remove_orphan_files,
    rollback_to_version,
)
from .partitioning import PartitionField, bucket, days, identity, mbucket
from .table import LakeTable, file_may_match

__all__ = [
    "LakeTable",
    "file_may_match",
    "rewrite_clustered",
    "PartitionField",
    "bucket",
    "days",
    "identity",
    "mbucket",
    "expire_snapshots",
    "migrate_layout",
    "remove_orphan_files",
    "rollback_to_version",
]
