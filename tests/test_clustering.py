"""Z-order clustering rewrite: state preservation + the skipping it buys.

The point of rewrite_clustered is measurable at the manifest level: after
clustering on (a, b), a range predicate on EITHER column must prune most
files via min/max stats, where the arrival-order layout pruned none.
"""

from __future__ import annotations

import random

from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from openmrs_module_epts_etl_spark.lake import LakeTable, bucket
from openmrs_module_epts_etl_spark.lake.clustering import (
    files_matching,
    rewrite_clustered,
)

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("a", IntegerType()),
        StructField("b", IntegerType()),
        StructField("tag", StringType()),
    ]
)


def _build(spark, path, n=40_000, commits=4):
    rng = random.Random(7)
    t = LakeTable.create(spark, path, SCHEMA)
    rows = [
        (i, rng.randrange(10_000), rng.randrange(10_000), f"g{rng.randrange(50):03d}")
        for i in range(n)
    ]
    per = n // commits
    for c in range(commits):
        chunk = spark.createDataFrame(rows[c * per : (c + 1) * per], SCHEMA)
        # several files per commit so there is something to skip
        t.append(chunk.repartition(8))
    return t, rows


def test_rewrite_preserves_state_and_improves_skipping(spark, tmp_path):
    t, rows = _build(spark, str(tmp_path / "t"))
    before = t.version
    where_a = [("a", ">=", 100), ("a", "<=", 400)]
    where_b = [("b", ">=", 9_000), ("b", "<=", 9_300)]
    # arrival-order layout: every file spans the whole domain of a and b
    assert len(files_matching(t, where_a)) == len(t.files)

    m = rewrite_clustered(t, ["a", "b"], target_rows_per_file=2_500)
    assert m["rows"] == len(rows)
    assert t.version == before + 1
    assert m["files_after"] >= 8

    # exact same table state (full-row equality)
    got = sorted(tuple(r) for r in t.read().collect())
    assert got == sorted(rows)

    # Z-order property: BOTH clustered columns prune, not just the leading one
    n = len(t.files)
    surv_a = len(files_matching(t, where_a))
    surv_b = len(files_matching(t, where_b))
    assert surv_a <= n // 2, (surv_a, n)
    assert surv_b <= n // 2, (surv_b, n)
    # and the pruned read still returns exact results
    expect_a = sum(1 for r in rows if 100 <= r[1] <= 400)
    assert t.read(where=where_a).count() == expect_a


def test_rewrite_respects_partitions_and_string_columns(spark, tmp_path):
    rng = random.Random(11)
    t = LakeTable.create(spark, str(tmp_path / "p"), SCHEMA, [bucket(2, "id")])
    rows = [
        (i, rng.randrange(1000), rng.randrange(1000), f"k{rng.randrange(100):04d}")
        for i in range(8_000)
    ]
    t.append(spark.createDataFrame(rows, SCHEMA).repartition(6))

    rewrite_clustered(t, ["tag", "a"], target_rows_per_file=1_000)
    # hive layout intact: every live file still carries its partition value
    assert all(f.partition.get("id_bucket") in {"0", "1"} for f in t.files)
    got = sorted(tuple(r) for r in t.read().collect())
    assert got == sorted(rows)
    # string prefix clustering prunes string range predicates
    n = len(t.files)
    surv = len(files_matching(t, [("tag", ">=", "k0000"), ("tag", "<=", "k0009")]))
    assert surv < n, (surv, n)


def test_rewrite_partition_filter_limits_scope(spark, tmp_path):
    t, rows = _build(spark, str(tmp_path / "s"), n=4_000, commits=2)
    untouched = {f.path for f in t.files}
    m = rewrite_clustered(t, ["a"], partition_filter=lambda p: False)
    assert m == {"files_before": 0, "files_after": 0, "rows": 0, "columns": ["a"]}
    assert {f.path for f in t.files} == untouched
