"""Partition transforms for the lake table format.

Iceberg-shaped hidden partitioning: each :class:`PartitionField` derives a
partition value from a data column, so partition values are always recomputable
from the row itself (critical for CDC merges: a delete event only carries the
key, but the key column — e.g. conv_id under ``bucket(N, conv_id)`` — is enough
to prune the target scan to the right buckets).

The reference's only "partitioning" is equal-width PK ranges fanned out to
threads (api:engine/record_intervals_manager/ThreadCurrentIntervals.java:64-98).
Here partitioning does real work: data layout (days(ts) + bucket(conv_id)),
scan pruning, and shuffle distribution.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PartitionField:
    name: str           # partition column name in the layout, e.g. "ts_day"
    source: str         # data column it derives from
    transform: str      # human-readable, e.g. "days(ts)" / "bucket(16, conv_id)"
    expr_fn: Callable[[str], Column]

    def expr(self) -> Column:
        return self.expr_fn(self.source).alias(self.name)

    def to_json(self) -> dict:
        return {"name": self.name, "source": self.source, "transform": self.transform}


def days(source: str, name: str | None = None) -> PartitionField:
    """days(ts) → 'YYYY-MM-DD' string (stable, readable hive dir values)."""
    return PartitionField(
        name=name or f"{source}_day",
        source=source,
        transform=f"days({source})",
        expr_fn=lambda c: F.date_format(F.col(c), "yyyy-MM-dd"),
    )


def bucket(n: int, source: str, name: str | None = None) -> PartitionField:
    """bucket(n, col): stable hash bucket. xxhash64 is seed-stable across Spark
    versions and JVMs, so bucket assignment is reproducible — required for
    bucket pruning on the merge path.
    """
    return PartitionField(
        name=name or f"{source}_bucket",
        source=source,
        transform=f"bucket({n}, {source})",
        expr_fn=lambda c: F.pmod(F.xxhash64(F.col(c)), F.lit(n)).cast("int"),
    )


def mbucket(n: int, source: str, name: str | None = None) -> PartitionField:
    """bucket(n, col) using Spark's Murmur3 ``F.hash`` — the SAME hash
    HashPartitioning applies under ``df.repartition(N, col)``. That identity
    is the point: when N is a multiple of n, ``pmod(hash(col), N) == p``
    implies ``pmod(hash(col), n) == p % n``, so every task of a
    conv_id-repartitioned plan holds exactly ONE bucket and a partitioned
    write needs no further clustering exchange (write_data_files
    ``arrange=False``). Pruning/layout semantics are identical to
    ``bucket``; choose mbucket when the write path should be able to reuse a
    join/aggregation repartition as its clustering (the MoR compaction and
    dedupe-append paths do), plain bucket when xxhash64's seed-stability
    story is preferred. Murmur3 with Spark's fixed seed 42 is equally
    deterministic across executors and versions in practice."""
    return PartitionField(
        name=name or f"{source}_bucket",
        source=source,
        transform=f"mbucket({n}, {source})",
        expr_fn=lambda c: F.pmod(F.hash(F.col(c)), F.lit(n)).cast("int"),
    )


def identity(source: str, name: str | None = None) -> PartitionField:
    return PartitionField(
        name=name or source,
        source=source,
        transform=f"identity({source})",
        expr_fn=lambda c: F.col(c),
    )


def from_json(spec: list[dict]) -> list[PartitionField]:
    out: list[PartitionField] = []
    for f in spec:
        t = f["transform"]
        if t.startswith("days("):
            out.append(days(f["source"], f["name"]))
        elif t.startswith("bucket("):
            n = int(t[len("bucket(") :].split(",")[0])
            out.append(bucket(n, f["source"], f["name"]))
        elif t.startswith("mbucket("):
            n = int(t[len("mbucket(") :].split(",")[0])
            out.append(mbucket(n, f["source"], f["name"]))
        elif t.startswith("identity("):
            out.append(identity(f["source"], f["name"]))
        else:  # pragma: no cover
            raise ValueError(f"unknown transform {t!r}")
    return out
