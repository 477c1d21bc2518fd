from .partitioning import PartitionField, bucket, days, identity
from .table import LakeTable

__all__ = ["LakeTable", "PartitionField", "bucket", "days", "identity"]
