"""Operational queries — the reference's control-plane/validation operators
re-expressed as scale-safe DataFrame plans (SURVEY.md §2.7, §2.9, §2.11):

- DETECT_GAPES → :func:`pk_gap_detect`
  (api:detectgapes/processor/DetectGapesProcessor.java:41-67)
- DATA_RECONCILIATION (MISSING/OUTDATED/PHANTOM) → :func:`reconciliation_report_q`
  (api:reconciliation/processor/CentralAndRemoteDataReconciliationProcessor.java;
  reasons api:reconciliation/model/ConciliationReasonType.java)
- EXISTS/NOT-EXISTS set composition → :func:`customer_activity_setops`
  (api:etl/model/EtlDatabaseObjectSearchParams.java:139-211)

plus the training-data text ops the engine adds beyond the reference:
token counting (:func:`token_stats`), rolling-window document fingerprinting
(:func:`doc_fingerprints`), and embedding-cosine near-duplicate detection
(:func:`embedding_near_dup_pairs`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.reconcile import reconciliation_report
from .base import t

# ----------------------------------------------------------- gap detection
GAP_BLOCK = 1024


def pk_gap_detect(spark: SparkSession, sf: str) -> DataFrame:
    """Holes in the orders PK sequence (synthesized: keys ≡ 0 mod 97 are
    dropped so the detector has something to find on the dense testdata).

    The reference walks the sorted PK stream sequentially with a prev-record
    diff (DetectGapesProcessor.java:41-67) — a single-threaded scan. Here the
    same result comes from a three-level block recursion in which no window
    ever forms one global partition:

    1. ``lag`` within PK *blocks* of GAP_BLOCK keys (parallel across blocks);
    2. ``lag`` over per-block min/max, partitioned by *superblock*
       (GAP_BLOCK² keys) — catches gaps straddling block boundaries,
       parallel across superblocks;
    3. ``lag`` over per-superblock min/max, globally ordered — the only
       single-partition stage, holding key_range/GAP_BLOCK² rows (a 10^12
       key space → ~10^6 rows ≈ 16 MB: reducer-safe; each extra level
       divides by another 1024 if ever needed).
    """
    superblock = GAP_BLOCK * GAP_BLOCK
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            (F.col("o_orderkey") - F.col("o_orderkey") % GAP_BLOCK).alias("blk"),
            (F.col("o_orderkey") - F.col("o_orderkey") % superblock).alias("sblk"),
        )
    )
    w_in = Window.partitionBy("blk").orderBy("o_orderkey")
    prev = F.lag("o_orderkey").over(w_in)
    within = (
        o.withColumn("prev", prev)
        .filter(F.col("prev").isNotNull() & (F.col("o_orderkey") - F.col("prev") > 1))
        .select((F.col("prev") + 1).alias("gap_start"), (F.col("o_orderkey") - 1).alias("gap_end"))
    )
    blocks = o.groupBy("sblk", "blk").agg(
        F.min("o_orderkey").alias("blk_min"), F.max("o_orderkey").alias("blk_max")
    )
    w_blk = Window.partitionBy("sblk").orderBy("blk")  # parallel across superblocks
    prev_max = F.lag("blk_max").over(w_blk)
    across_blocks = (
        blocks.withColumn("prev_max", prev_max)
        .filter(F.col("prev_max").isNotNull() & (F.col("blk_min") - F.col("prev_max") > 1))
        .select((F.col("prev_max") + 1).alias("gap_start"), (F.col("blk_min") - 1).alias("gap_end"))
    )
    supers = blocks.groupBy("sblk").agg(
        F.min("blk_min").alias("s_min"), F.max("blk_max").alias("s_max")
    )
    w_sup = Window.orderBy("sblk")  # rows = key_range/GAP_BLOCK² — reducer-safe
    prev_smax = F.lag("s_max").over(w_sup)
    across_supers = (
        supers.withColumn("prev_max", prev_smax)
        .filter(F.col("prev_max").isNotNull() & (F.col("s_min") - F.col("prev_max") > 1))
        .select((F.col("prev_max") + 1).alias("gap_start"), (F.col("s_min") - 1).alias("gap_end"))
    )
    return within.unionByName(across_blocks).unionByName(across_supers)


PK_GAP_SQL = """
WITH s AS (
  SELECT o_orderkey AS k, lag(o_orderkey) OVER (ORDER BY o_orderkey) AS p
  FROM orders WHERE o_orderkey % 97 <> 0)
SELECT p + 1 AS gap_start, k - 1 AS gap_end FROM s WHERE p IS NOT NULL AND k - p > 1
"""


# ---------------------------------------------------------- reconciliation
def reconciliation_report_q(spark: SparkSession, sf: str) -> DataFrame:
    """MISSING / PHANTOM / OUTDATED between a deterministic src/dst pair
    derived from orders (src drops keys ≡1 mod 1000; dst drops keys ≡1 mod
    997 and perturbs o_totalprice on keys ≡0 mod 211). Anti-joins both ways +
    null-safe field comparison — the reference's reconciliation scan without
    its per-record re-SELECTs."""
    orders = t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    src = orders.filter(F.col("o_orderkey") % 1000 != 1)
    dst = orders.filter(F.col("o_orderkey") % 997 != 1).select(
        "o_orderkey",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 211 == 0, F.lit(1.0)).otherwise(F.lit(0.0))
        ).alias("o_totalprice"),
    )
    return reconciliation_report(src, dst, ["o_orderkey"], ["o_totalprice"])


RECONCILIATION_SQL = """
WITH src AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 1000 <> 1),
dst AS (
  SELECT o_orderkey,
         o_totalprice + CASE WHEN o_orderkey % 211 = 0 THEN 1.0 ELSE 0.0 END AS o_totalprice
  FROM orders WHERE o_orderkey % 997 <> 1)
SELECT s.o_orderkey, 'MISSING' AS reason FROM src s
  WHERE NOT EXISTS (SELECT 1 FROM dst d WHERE d.o_orderkey = s.o_orderkey)
UNION ALL
SELECT d.o_orderkey, 'PHANTOM' AS reason FROM dst d
  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = d.o_orderkey)
UNION ALL
SELECT s.o_orderkey, 'OUTDATED' AS reason
  FROM src s JOIN dst d ON s.o_orderkey = d.o_orderkey
  WHERE s.o_totalprice <> d.o_totalprice
"""


# ------------------------------------------------------------------ set ops
def customer_activity_setops(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT / EXCEPT over customer keys vs ordering customers — the
    set-operation surface the reference only reaches through EXISTS/NOT
    EXISTS subquery composition (§2.7). Distinct set semantics on both
    engines; both inputs pre-projected to the single key column so the
    shuffles carry nothing else."""
    cust = t(spark, sf, "customer").select("c_custkey")
    buyers = t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    active = cust.intersect(buyers).withColumn("status", F.lit("ACTIVE"))
    inactive = cust.exceptAll(buyers.distinct()).distinct().withColumn(
        "status", F.lit("INACTIVE")
    )
    return active.unionByName(inactive)


SETOPS_SQL = """
SELECT c_custkey, 'ACTIVE' AS status
  FROM (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
UNION ALL
SELECT c_custkey, 'INACTIVE' AS status
  FROM (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
"""


# ------------------------------------------------------------- token stats
_BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document token counting three ways: whitespace tokens, lowercase
    word tokens, and a BPE-ish segmentation (letter runs | digit runs |
    single punctuation). All three are JVM-side regexp_extract_all — one
    narrow projection, no shuffle, trivially data-parallel at any scale."""
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("word_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_ISH), F.lit(0))).alias(
            "bpe_tokens"
        ),
    )


TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
FROM documents
"""


# --------------------------------------------------------- fingerprinting
SHINGLE = 8


def doc_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprints: an exact md5 of the text plus TWO
    rolling-window fingerprints (winnowing-style; stable under small
    appends, unlike the whole-document hash):

    - ``min_shingle_md5`` — minimum md5 over every 8-char shingle; one
      digest per character position (higher-order ``transform`` over a
      ``sequence``, JVM-side, nothing materialized);
    - ``rk_fingerprint`` — minimum Rabin-Karp hash over the same windows at
      O(1) arithmetic per character (functions/text.with_rolling_fingerprint)
      — the variant to use when fingerprinting is a hot pass over 100 TB;
      md5-min stays as the collision-hardened cross-system form.
    """
    from ..functions.text import with_rolling_fingerprint

    d = t(spark, sf, "documents")
    base = d.select(
        "doc_id",
        "text",
        F.md5(F.col("text").cast("binary")).alias("full_md5"),
        F.expr(
            f"array_min(transform(sequence(1, greatest(char_length(text) - {SHINGLE - 1}, 1)),"
            f" i -> md5(cast(substring(text, i, {SHINGLE}) as binary))))"
        ).alias("min_shingle_md5"),
    )
    return with_rolling_fingerprint(base, "text", "rk_fingerprint").drop("text")


def _doc_fingerprints_sql() -> str:
    from ..functions.text import _M31, _RK_BK1, RK_BASE, RK_P, RK_WINDOW

    k, b, p, bk1, m31 = RK_WINDOW, RK_BASE, RK_P, _RK_BK1, _M31
    m0 = m31 - 1
    hexpr = (
        f"(((CASE WHEN i <= {k} THEN (acc // {m31}) * {b} + cs[i] "
        f"ELSE ((acc // {m31}) - CAST(cs[i - {k}] AS BIGINT) * {bk1}) * {b} + cs[i] "
        f"END) % {p}) + {p}) % {p}"
    )
    return f"""
WITH c AS (
  SELECT doc_id, text,
         list_transform(string_split(text, ''), ch -> unicode(ch)) AS cs
  FROM documents)
SELECT doc_id,
       md5(text) AS full_md5,
       list_aggregate(
         [md5(substr(text, i, {SHINGLE}))
          for i in range(1, greatest(len(text) - {SHINGLE - 1}, 1) + 1)],
         'min') AS min_shingle_md5,
       CASE WHEN len(text) > 0 THEN
       list_reduce(
         [CAST({m0} AS BIGINT)] || range(1, len(cs) + 1),
         (acc, i) -> ({hexpr}) * {m31}
                     + least(acc % {m31},
                             CASE WHEN i >= {k} OR i = len(cs) THEN ({hexpr})
                                  ELSE {m0} END)
       ) % {m31} END AS rk_fingerprint
FROM c
"""


DOC_FINGERPRINTS_SQL = _doc_fingerprints_sql()


# --------------------------------------------- embedding near-dup detection
NEAR_DUP_THRESHOLD = 0.30
_ND_BANDS, _ND_PLANES = 8, 6


def embedding_near_dup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the SCALE path: banded
    hyperplane-LSH candidate generation (functions.vector.lsh_near_dup_pairs)
    with exact cosine verification. Candidates form per (band, bucket), so
    pair generation is |bucket|²-bounded — label-blocking (kept as
    ``embedding_near_dup_exact``, the recall baseline) is quadratic in the
    largest label at 100 TB. Oracle-checkable the same way as ann_lsh_topk:
    the hyperplane constants are embedded verbatim in the generated DuckDB
    twin, so both engines compute identical buckets."""
    from ..functions.vector import lsh_near_dup_pairs

    emb = t(spark, sf, "embeddings")
    return lsh_near_dup_pairs(
        emb, dim=64, threshold=NEAR_DUP_THRESHOLD,
        bands=_ND_BANDS, planes_per_band=_ND_PLANES,
    )


def _near_dup_lsh_sql(
    dim: int = 64,
    bands: int = _ND_BANDS,
    planes_per_band: int = _ND_PLANES,
    seed: int = 42,
    threshold: float = NEAR_DUP_THRESHOLD,
) -> str:
    from ..functions.vector import _hyperplanes

    planes = _hyperplanes(dim, bands * planes_per_band, seed)

    def bucket_expr(b: int) -> str:
        return " + ".join(
            "(CASE WHEN list_dot_product(ev, ["
            + ", ".join(repr(float(x)) for x in planes[b * planes_per_band + p])
            + f"]) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(planes_per_band)
        )

    stacked = "\n  UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, ({bucket_expr(b)})::BIGINT AS bucket FROM e"
        for b in range(bands)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding, list_transform(embedding, v -> v::DOUBLE) AS ev
  FROM embeddings),
stacked AS (
  {stacked}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM stacked a JOIN stacked b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id),
scored AS (
  SELECT id_a, id_b,
         ROUND(
           list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
                                   x -> (x[1]::DOUBLE) * (x[2]::DOUBLE)))
           / (sqrt(list_sum(list_transform(ea.embedding, v -> (v::DOUBLE) * (v::DOUBLE))))
              * sqrt(list_sum(list_transform(eb.embedding, v -> (v::DOUBLE) * (v::DOUBLE))))),
           4) AS cosine_sim
  FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b)
SELECT id_a, id_b, cosine_sim FROM scored WHERE cosine_sim >= {threshold}
"""


def embedding_near_dup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label: candidate
    pairs only form inside a label block (the blocking key stands in for an
    LSH bucket — the self-join is per-block, never corpus²). Exact within
    blocks — the small-SF recall baseline for the LSH scale path above; at
    scale the largest label makes this quadratic. Dot products via
    ``zip_with``+``aggregate`` in double precision; rounded for cross-engine
    float parity."""
    nrm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v * v))  # noqa: E731
    # the norm is per-row data: compute it once before the self-join instead
    # of twice per candidate pair (same expression → bit-identical floats →
    # oracle parity survives); only the dot product remains pair-level work
    e = t(spark, sf, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    e = e.withColumn("nv", nrm(F.col("v")))
    a = e.alias("a")
    b = e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cos = F.round(F.try_divide(dot, F.col("a.nv") * F.col("b.nv")), 4)
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            cos.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= NEAR_DUP_THRESHOLD)
    )


NEAR_DUP_SQL = f"""
SELECT * FROM (
  SELECT a.label AS label, a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         ROUND(
           list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                   x -> (x[1]::DOUBLE) * (x[2]::DOUBLE)))
           / (sqrt(list_sum(list_transform(a.embedding, v -> (v::DOUBLE) * (v::DOUBLE))))
              * sqrt(list_sum(list_transform(b.embedding, v -> (v::DOUBLE) * (v::DOUBLE))))),
           4) AS cosine_sim
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id)
WHERE cosine_sim >= {NEAR_DUP_THRESHOLD}
"""


QUERIES = {
    "pk_gap_detect": pk_gap_detect,
    "reconciliation_report": reconciliation_report_q,
    "customer_activity_setops": customer_activity_setops,
    "token_stats": token_stats,
    "doc_fingerprints": doc_fingerprints,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "embedding_near_dup_exact": embedding_near_dup_exact,
}

ORACLES = {
    "pk_gap_detect": PK_GAP_SQL,
    "reconciliation_report": RECONCILIATION_SQL,
    "customer_activity_setops": SETOPS_SQL,
    "token_stats": TOKEN_STATS_SQL,
    "doc_fingerprints": DOC_FINGERPRINTS_SQL,
    "embedding_near_dup_pairs": _near_dup_lsh_sql(),
    "embedding_near_dup_exact": NEAR_DUP_SQL,
}
