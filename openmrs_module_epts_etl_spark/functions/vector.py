"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline. Dot products with
  ``F.zip_with`` + ``F.aggregate`` — JVM-side, no Python. The corpus×queries
  cross join broadcasts the (small) query set, so the big side never
  shuffles; top-k per query is a window over the (tiny) candidate set.
- LSH-bucketed top-k: the scale path. Random-hyperplane signatures computed
  by a vectorized pandas UDF (numpy matmul over Arrow batches — the one place
  Python earns its keep), then candidates are restricted to matching buckets
  with multi-probe fallback.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: zero vectors yield NULL (excluded from top-k) instead of an
    # ANSI divide-by-zero error (Spark 4 runs ANSI mode by default)
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def brute_force_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int | None = 4,
) -> DataFrame:
    """Exact top-k neighbors per query. Returns
    (query_id, neighbor_id, cosine_sim, rank). Self-matches excluded.
    ``round_to`` stabilizes float ordering for cross-engine comparison."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    sim = cosine(F.col("qv"), F.col("cv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(n_planes, dim)).astype(np.float64)


def hyperplane_signature_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Vectorized signature: sign-bit pattern of dot products with fixed
    random hyperplanes. Arrow batches in, one numpy matmul per batch."""
    planes = _hyperplanes(dim, n_planes, seed)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, planes)
        return pd.Series((bits @ weights).astype(np.int64))

    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the query's LSH
    bucket. Recall can be raised with multi-probe (flip one signature bit);
    probes at Hamming distance ≤1 are included here."""
    sig = hyperplane_signature_udf(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        sig(F.col(vec_col)).alias("qbucket"),
    )
    # multi-probe: query bucket plus all 1-bit flips
    probes = F.array(*([F.col("qbucket")] + [F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]))
    qp = q.select("query_id", "qv", F.explode(probes).alias("bucket"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), 4)
    scored = (
        c.join(F.broadcast(qp), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
