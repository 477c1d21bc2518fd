"""Multi-column clustering rewrite — the OPTIMIZE ... ZORDER analog.

The reference engine never needs this: its destination is an indexed RDBMS,
so secondary-column point queries ride B-trees (the DST databases of
api:controller/conf/EtlConfiguration.java). A lake table has no B-tree —
file-level min/max stats (lake/table.py manifest stats) are the only index,
and they only prune on columns the data happens to be *laid out* by. After
thousands of CDC epochs the layout is arrival order: every file spans the
whole domain of every non-partition column and nothing skips.

``rewrite_clustered`` restores skipping for a chosen column set by rewriting
live data ordered along a Z-order (Morton) curve over those columns:

1. per column, equi-depth bucket boundaries from a distributed quantile
   sketch (`approxQuantile` — skew-robust where linear min/max scaling is
   not: one hot conversation would otherwise own every bucket);
2. per row, an interleaved-bit Z-value computed entirely JVM-side from the
   bucket ids (no UDF);
3. a single range repartition + within-partition sort on
   (partition columns.., z) so each output file covers a small hyper-rectangle
   of the clustered column space — its min/max stats then exclude most
   predicates on ANY clustered column, not just the leading one (the reason
   Z-order beats a lexicographic sort for multi-column workloads);
4. one OCC commit swapping all rewritten files (lake/table.py:688 retry
   loop), so concurrent epoch appends rebase cleanly on top.

Cost model at 100 TB: one full shuffle of the rewritten partitions — the
same cost class as MoR compaction, run on the same maintenance cadence, and
restricted via ``partition_filter`` to recently written partitions so steady
state rewrites only the new tail, never the whole table.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .table import DataFile, LakeTable, file_may_match

# 4 bits (16 equi-depth buckets) per column: with the default 2-4 clustered
# columns the Z-value fits in 8-16 bits, giving 256-65536 distinct curve
# positions — far more than the file count of any single rewrite, so files
# get contiguous curve ranges (tight stats) without boundary lists growing
# past what a lit() array comfortably ships to executors.
_BITS = 4
_BUCKETS = 1 << _BITS


def _sortable(col: str, dtype: str) -> Column:
    """An order-preserving DOUBLE image of the column, for quantile
    sketching and bucket assignment. Strings map through their first 8
    bytes (base-256 prefix value — preserves prefix order, which is the
    order string range predicates prune on)."""
    if dtype in ("string",):
        return F.expr(
            f"aggregate(sequence(1, 8), cast(0 as double), "
            f"(acc, i) -> acc * 256.0d + coalesce(ascii(substring(`{col}`, i, 1)), 0))"
        )
    if dtype.startswith("timestamp"):
        return F.unix_micros(F.col(col).cast("timestamp_ltz")).cast("double")
    if dtype == "date":
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    return F.col(col).cast("double")


def _bucket_id(sortable: Column, boundaries: list[float]) -> Column:
    """Equi-depth bucket id ∈ [0, len(boundaries)]: the count of interior
    boundaries ≤ value. O(#buckets) comparisons per row, all JVM-side;
    nulls sort to bucket 0."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(sortable >= b, 1).otherwise(0),
    )


def zorder_value(pairs: list[tuple[Column, int]]) -> Column:
    """Interleave the low `_BITS` bits of each bucket-id column into one
    Morton code: bit j of column c lands at position j*k + c. Pure integer
    shifts/ors — whole-stage-codegen friendly."""
    k = len(pairs)
    z = F.lit(0)
    for c, (bucket, _idx) in enumerate(pairs):
        b = bucket.cast("long")
        for j in range(_BITS):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b, j).bitwiseAND(F.lit(1)), j * k + c)
            )
    return z


def rewrite_clustered(
    table: LakeTable,
    columns: list[str],
    partition_filter=None,
    target_rows_per_file: int = 2_000_000,
) -> dict:
    """Rewrite the live files (optionally restricted to partitions passing
    ``partition_filter``) Z-ordered by ``columns``. Returns a metrics dict
    {files_before, files_after, rows, columns}.

    Tombstones and engine columns ride along untouched (include_hidden
    read), so CDC semantics — lsn guards, delete fencing — are preserved
    across the rewrite; only layout changes.
    """
    if not columns:
        raise ValueError("need at least one clustering column")
    schema = {f.name: f.dataType.simpleString() for f in table.schema.fields}
    for c in columns:
        if c not in schema:
            raise ValueError(f"unknown clustering column {c!r}")

    victims = [
        f
        for f in table.files
        if partition_filter is None or partition_filter(f.partition)
    ]
    if not victims:
        return {"files_before": 0, "files_after": 0, "rows": 0, "columns": columns}
    df = table.read(files=victims, include_hidden=True)

    # 1. quantile sketch per clustered column (one distributed pass over a
    #    pure projection — column-pruned scan of just the clustered columns)
    sort_cols = [f"__s_{i}" for i in range(len(columns))]
    proj = df.select(
        *[_sortable(c, schema[c]).alias(s) for c, s in zip(columns, sort_cols)]
    )
    qs = [i / _BUCKETS for i in range(1, _BUCKETS)]
    all_bounds = proj.approxQuantile(sort_cols, qs, 0.001)

    # 2-3. Z-value + range-repartition + sort; dedupe boundary repeats so a
    #    heavily-duplicated value doesn't spend several identical buckets
    zdf = df
    pairs: list[tuple[Column, int]] = []
    for i, (c, s) in enumerate(zip(columns, sort_cols)):
        bounds = sorted({b for b in all_bounds[i] if b is not None})
        zdf = zdf.withColumn(s, _sortable(c, schema[c]))
        pairs.append((_bucket_id(F.col(s), bounds), i))
    zdf = zdf.withColumn("__z", zorder_value(pairs)).drop(*sort_cols)

    total_rows = sum(f.rows for f in victims)
    n_out = max(1, math.ceil(total_rows / target_rows_per_file))
    spec = table.partition_spec
    key_names = [f"__k_{p.name}" for p in spec]
    for p, name in zip(spec, key_names):
        zdf = zdf.withColumn(name, p.expr_fn(p.source))
    order = [*key_names, "__z"]
    arranged = (
        zdf.repartitionByRange(n_out, *[F.col(o) for o in order])
        .sortWithinPartitions(*order)
        .drop("__z", *key_names)
    )

    files, rel_dir = table.write_data_files(arranged, arrange=False)

    # 4. single swap commit; OCC rebase handles concurrent epoch appends
    table.commit(
        add=files,
        remove_paths={f.path for f in victims},
        metrics={
            "operation": "rewrite_clustered",
            "columns": columns,
            "files_before": len(victims),
            "files_after": len(files),
            "rows": total_rows,
        },
    )
    return {
        "files_before": len(victims),
        "files_after": len(files),
        "rows": total_rows,
        "columns": columns,
    }


def files_matching(table: LakeTable, where: list[tuple[str, str, object]]) -> list[DataFile]:
    """The manifest-level skip decision, exposed for observability/tests:
    which live files survive stats pruning for this predicate."""
    return [f for f in table.files if file_may_match(f, where)]
