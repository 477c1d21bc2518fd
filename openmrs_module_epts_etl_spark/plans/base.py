from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(col: Column, scale: int = 4) -> Column:
    """Exact decimal sum surfaced as double: summing doubles in different
    orders (Spark partitions vs DuckDB) drifts in the last ulps, which breaks
    value-hash comparison; summing decimals is order-invariant and exact, and
    the final double cast is deterministic on both engines."""
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


def davg(col: Column, scale: int = 6) -> Column:
    """Order-invariant average: exact decimal sum (cast double) divided by
    count — both deterministic, unlike engine-native decimal avg whose
    intermediate rounding differs between Spark and DuckDB."""
    return dsum(col, scale) / F.count(col)
