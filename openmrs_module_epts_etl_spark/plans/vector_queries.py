"""Similarity-search queries over ``embeddings`` (vec_id, embedding float[64],
label)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import (
    _hyperplanes,
    brute_force_cosine_topk,
    ivf_flat_topk,
    lsh_bucketed_topk,
    norm,
)
from .base import t

N_QUERIES = 3  # first N vec_ids serve as query vectors
TOP_K = 5


def ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return brute_force_cosine_topk(emb, queries, k=TOP_K, round_to=4)


ANN_COSINE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND(
           list_sum(list_transform(list_zip(qv, e.embedding),
                                   x -> (x[1]::DOUBLE) * (x[2]::DOUBLE)))
           / (sqrt(list_sum(list_transform(qv, v -> (v::DOUBLE) * (v::DOUBLE))))
              * sqrt(list_sum(list_transform(e.embedding, v -> (v::DOUBLE) * (v::DOUBLE))))),
           4) AS cosine_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


def embedding_norms(spark: SparkSession, sf: str) -> DataFrame:
    emb = t(spark, sf, "embeddings")
    return emb.select(
        "vec_id",
        F.round(norm(F.col("embedding").cast("array<double>")), 6).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )


EMBEDDING_NORMS_SQL = """
SELECT vec_id,
       ROUND(sqrt(list_sum(list_transform(embedding, v -> (v::DOUBLE) * (v::DOUBLE)))), 6) AS l2_norm,
       len(embedding) AS dim
FROM embeddings
"""


def label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed vector aggregation: per-label centroid, computed as
    posexplode → exact decimal mean per (label, dim) — order-invariant, so
    the shuffled Spark sum matches the sequential SQL sum bit-for-bit."""
    emb = t(spark, sf, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    # double → string → decimal: the string is the shortest round-trip repr on
    # both engines (identical), and decimal(38,25) holds it exactly (float32
    # values as doubles need ≤23 fractional digits) — so the sum is exact and
    # order-invariant, unlike a direct double→decimal cast whose rounding
    # differs between Spark (rounds the repr) and DuckDB (rounds the binary).
    v_exact = F.col("v").cast("string").cast("decimal(38,25)")
    # final round(9) absorbs the 1-ulp difference in decimal→double casting
    # between engines (sums themselves are exact)
    return exploded.groupBy("label", "pos").agg(
        F.round(F.sum(v_exact).cast("double") / F.count("v"), 9).alias("centroid_v")
    )


LABEL_CENTROIDS_SQL = """
WITH e AS (
  SELECT label,
         unnest(generate_series(0, len(embedding) - 1)) AS pos,
         unnest(embedding) AS v
  FROM embeddings)
SELECT label, pos::INT AS pos,
       ROUND((SUM((v::DOUBLE)::VARCHAR::DECIMAL(38,25)))::DOUBLE / COUNT(v), 9) AS centroid_v
FROM e GROUP BY label, pos
"""


def ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Scale-path ANN: hyperplane-LSH bucketing via vectorized pandas UDF.
    Deterministic given the seed, so it IS oracle-checkable: the hyperplane
    constants are generated once in Python and embedded verbatim into both
    the numpy matmul (Spark side) and the generated DuckDB SQL (_ann_lsh_sql)
    — same trick as the shared minhash coefficients. Recall vs the exact
    baseline is additionally asserted in tests/test_functions.py."""
    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return lsh_bucketed_topk(emb, queries, dim=64, k=TOP_K)


def _ann_lsh_sql(dim: int = 64, n_planes: int = 12, seed: int = 42) -> str:
    """DuckDB twin of lsh_bucketed_topk: identical hyperplane constants,
    bucket = sign-bit pattern of the dot products, multi-probe at Hamming ≤ 1,
    exact cosine ranking inside the probed buckets. Float64 repr round-trips
    exactly, so the embedded literals equal the numpy values bit-for-bit; a
    sign flip would need |dot| below the cross-engine summation-order error
    (~1e-13 relative) — vanishingly unlikely and checked empirically."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket_terms = " + ".join(
        "(CASE WHEN list_dot_product(ev, ["
        + ", ".join(repr(float(x)) for x in planes[p])
        + f"]) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    probes = ", ".join(f"xor(qbucket, {1 << i})" for i in range(n_planes))
    return f"""
WITH sigc AS (
  SELECT vec_id, embedding,
         ({bucket_terms})::BIGINT AS bucket
  FROM (SELECT vec_id, embedding, list_transform(embedding, v -> v::DOUBLE) AS ev
        FROM embeddings)),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
      FROM sigc WHERE vec_id < {N_QUERIES}),
qp AS (SELECT query_id, qv, unnest(list_prepend(qbucket, [{probes}])) AS bucket FROM q),
scored AS (
  SELECT DISTINCT qp.query_id, c.vec_id AS neighbor_id,
         ROUND(
           list_sum(list_transform(list_zip(qp.qv, c.embedding),
                                   x -> (x[1]::DOUBLE) * (x[2]::DOUBLE)))
           / (sqrt(list_sum(list_transform(qp.qv, v -> (v::DOUBLE) * (v::DOUBLE))))
              * sqrt(list_sum(list_transform(c.embedding, v -> (v::DOUBLE) * (v::DOUBLE))))),
           4) AS cosine_sim
  FROM sigc c JOIN qp ON c.bucket = qp.bucket
  WHERE c.vec_id <> qp.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


# IVF codebook: a deterministic sample of corpus rows — vec_ids
# 0, 31, …, 465 (16 centroids at every SF ≥ 0.01). Both engines read the SAME
# vectors from the table, so no constants cross the engine boundary at all.
IVF_STEP, IVF_MAX_CID, IVF_NPROBE = 31, 496, 2


def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Second ANN scale path: IVF-Flat over a sampled codebook. The 16
    centroid vectors are collected driver-side (bounded: the codebook, not
    the corpus) and embedded as plan literals, making cell assignment a
    shuffle-free projection — see functions/vector.ivf_flat_topk."""
    emb = t(spark, sf, "embeddings")
    cents = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(
            (F.col("vec_id") % IVF_STEP == 0) & (F.col("vec_id") < IVF_MAX_CID)
        )
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .collect()
    ]
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return ivf_flat_topk(emb, queries, cents, k=TOP_K, nprobe=IVF_NPROBE)


_IVF_COS = """
           list_sum(list_transform(list_zip({a}, {b}),
                                   x -> (x[1]::DOUBLE) * (x[2]::DOUBLE)))
           / (sqrt(list_sum(list_transform({a}, v -> (v::DOUBLE) * (v::DOUBLE))))
              * sqrt(list_sum(list_transform({b}, v -> (v::DOUBLE) * (v::DOUBLE)))))"""

ANN_IVF_SQL = f"""
WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
           WHERE vec_id % {IVF_STEP} = 0 AND vec_id < {IVF_MAX_CID}),
cell_scores AS (
  SELECT e.vec_id, c.cid, {_IVF_COS.format(a="e.embedding", b="c.cv")} AS s
  FROM embeddings e CROSS JOIN c),
assigned AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM cell_scores) WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS query_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM cell_scores WHERE vec_id < {N_QUERIES}) WHERE rn <= {IVF_NPROBE}),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ROUND({_IVF_COS.format(a="q.qv", b="e.embedding")}, 4) AS cosine_sim
  FROM qprobe p
  JOIN assigned a ON a.cell = p.cell
  JOIN q ON q.query_id = p.query_id
  JOIN embeddings e ON e.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "embedding_norms": embedding_norms,
    "label_centroids": label_centroids,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
}

ORACLES = {
    "ann_cosine_topk": ANN_COSINE_SQL,
    "embedding_norms": EMBEDDING_NORMS_SQL,
    "label_centroids": LABEL_CENTROIDS_SQL,
    "ann_lsh_topk": _ann_lsh_sql(64, 12, 42),
    "ann_ivf_topk": ANN_IVF_SQL,
}
