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


def band_signature_udf(dim: int, bands: int, planes_per_band: int, seed: int = 42):
    """Banded hyperplane signatures: ONE numpy matmul against all
    bands×planes hyperplanes per Arrow batch, then the sign bits are packed
    into one integer per band. Returns array<long> of length ``bands``."""
    planes = _hyperplanes(dim, bands * planes_per_band, seed)
    weights = 1 << np.arange(planes_per_band, dtype=np.int64)

    @pandas_udf("array<long>")
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())                      # (batch, dim)
        bits = (m @ planes.T) > 0                          # (batch, bands*P)
        buckets = bits.reshape(len(m), bands, planes_per_band) @ weights
        return pd.Series(list(buckets.astype(np.int64)))

    return sig


def lsh_near_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bands: int = 8,
    planes_per_band: int = 6,
    seed: int = 42,
    round_to: int | None = 4,
) -> DataFrame:
    """Scale-path embedding near-dup detection: banded hyperplane LSH.

    Vectors sharing ANY band bucket become a candidate pair (pigeonhole over
    sign-bit bands — the cosine analog of MinHash banding); candidates are
    verified with the exact cosine. The self-join key is (band, bucket), so
    pair generation is |bucket|²-bounded per bucket, never corpus² and never
    blocked on a skewed metadata column — this replaces label-blocking,
    whose biggest block is quadratic at scale. Recall at similarity s is
    1-(1-((1-acos(s)/π))^P)^B — ≈0.998 for s=0.95 with 8×6 — and is
    asserted against the exact baseline in tests/test_functions.py."""
    sig = band_signature_udf(dim, bands, planes_per_band, seed)
    e = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        sig(F.col(vec_col)).alias("sig"),
    )
    # norms are per-row data: once per vector, not per candidate pair
    from ._cache import cycle_persist

    e = cycle_persist("lsh_near_dup_pairs.vectors", e.withColumn("nv", norm(F.col("v"))))
    # the banded self-join carries ONLY (id, band, bucket) — 24-byte rows;
    # vectors re-attach to the (far smaller) distinct candidate set after.
    # distinct on the full (id_a, id_b) projection is a HashAggregate with
    # no agg buffer (a dropDuplicates keeping the vectors would compile to
    # first(array)→SortAggregate and sort the payload, the exact plan
    # disease dedupe_latest documents).
    stacked = e.select("id", F.posexplode("sig").alias("band", "bucket"))
    a = stacked.alias("a")
    b = stacked.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nv").alias("na"))
    vb = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nv").alias("nb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    sim = F.try_divide(dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        pairs.withColumn("cosine_sim", sim)
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def _cell_scores(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Array of (cosine, -cid) structs, one per centroid — the codebook is
    embedded as literals, so scoring is a pure projection: scan → project,
    no join, no shuffle, whole-stage codegen. NULL cosines (zero vectors)
    are floored to -2 so struct comparison stays total."""
    entries = []
    for cid, cv in centroids:
        lit_v = F.array(*[F.lit(float(x)) for x in cv])
        sim = F.coalesce(cosine(vec, lit_v), F.lit(-2.0))
        entries.append(F.struct(sim.alias("s"), F.lit(-int(cid)).cast("long").alias("negcid")))
    return F.array(*entries)


def ivf_flat_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    round_to: int | None = 4,
) -> DataFrame:
    """IVF-Flat ANN: coarse quantization against a small codebook, exact
    cosine ranking inside the ``nprobe`` cells nearest each query.

    ``centroids`` is the codebook as (cid, vector) pairs — here a
    deterministic sample of corpus rows (a k-means codebook drops in
    unchanged). The codebook is driver-side by design: C ≈ √n_vectors
    centroids even at 10^10 vectors is ~10^5 rows, and embedding them as
    plan literals makes cell assignment a shuffle-free projection (argmax
    over C cosines per row; ties → smallest cid, matching the SQL oracle's
    ``ORDER BY s DESC, cid ASC``). Candidate volume per query is
    nprobe·n/C — the IVF trade: raise C to shrink cells, raise nprobe to
    recover recall (asserted vs the exact baseline in tests).
    """
    # --- assignment: one projection per side --------------------------------
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    best = F.array_max(_cell_scores(F.col("cv"), centroids))
    c = c.withColumn("cell", (-best["negcid"]).cast("long"))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    # top-nprobe cells per query: sort the (s, negcid) structs descending —
    # descending negcid = ascending cid on ties, same rule as assignment
    ranked = F.reverse(F.sort_array(_cell_scores(F.col("qv"), centroids)))
    probe_cells = F.transform(
        F.slice(ranked, 1, nprobe), lambda e: (-e["negcid"]).cast("long")
    )
    qp = q.select("query_id", "qv", F.explode(probe_cells).alias("cell"))

    # --- probe: broadcast the tiny (query, cell) set onto the corpus --------
    sim = cosine(F.col("qv"), F.col("cv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = (
        c.join(F.broadcast(qp), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


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
