from .maintenance import expire_snapshots, remove_orphan_files
from .partitioning import PartitionField, bucket, days, identity
from .table import LakeTable

__all__ = [
    "LakeTable",
    "PartitionField",
    "bucket",
    "days",
    "identity",
    "expire_snapshots",
    "remove_orphan_files",
]
