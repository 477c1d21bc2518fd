"""Text-analysis and dedup queries over ``documents`` — the training-data
pipeline surface. SQL oracles are generated from the same constants
(LANG_MARKERS, minhash coefficients) as the Spark implementations, so both
sides share one definition."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup import (
    MERSENNE_P,
    SIMHASH_BITS,
    SIMHASH_CHUNKS,
    _POLY_M,
    connected_components,
    contaminated_ids,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_coefficients,
    minhash_signatures,
    near_dup_jaccard,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    word_shingles,
)
from ..functions._cache import cycle_persist
from ..functions.text import LANG_MARKERS, language_id, quality_score, token_count
from .base import t

# ------------------------------------------------------- SQL building blocks
_TOKENS_SQL = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


def _occ_sql(haystack: str, marker: str) -> str:
    return (
        f"((length({haystack}) - length(replace({haystack}, '{marker}', ''))) / {len(marker)})::BIGINT"
    )


def _langid_sql_expr() -> str:
    """CASE expression mirroring functions.text.language_id."""
    norm = "(' ' || lower(coalesce(text,'')) || ' ')"
    scores = {
        lang: " + ".join(_occ_sql(norm, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    best = "GREATEST(" + ", ".join(f"({s})" for s in scores.values()) + ")"
    cjk = f"length(regexp_replace({norm}, '[^一-鿿]', '', 'g'))"
    whens = " ".join(
        f"WHEN ({scores[lang]}) = __best THEN '{lang}'" for lang in LANG_MARKERS
    )
    return f"""
      CASE WHEN {cjk} * 2 > length(trim({norm})) THEN 'zh'
           WHEN __best <= 0 THEN 'und'
           {whens}
           ELSE 'und' END
    """, best


# --------------------------------------------------------------- queries
def doc_stats_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


DOC_STATS_SQL = f"""
SELECT lang, COUNT(*) AS n_docs, SUM({_TOKENS_SQL})::BIGINT AS total_tokens,
       SUM(n_chars)::BIGINT AS total_chars
FROM documents GROUP BY lang
"""


def doc_quality(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
    )


DOC_QUALITY_SQL = f"""
WITH f AS (
  SELECT doc_id,
    {_TOKENS_SQL} AS n_tokens,
    length(coalesce(text,'')) AS n_chars,
    length(regexp_replace(coalesce(text,''), '[^a-zA-Z]', '', 'g')) AS n_alpha,
    length(regexp_replace(coalesce(text,''), '[^0-9]', '', 'g')) AS n_digit,
    length(regexp_replace(coalesce(text,''), '[^ ]', '', 'g')) AS n_space
  FROM documents),
g AS (
  SELECT doc_id, n_tokens,
    CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END AS alpha_ratio,
    CASE WHEN n_chars > 0 THEN n_digit / n_chars ELSE 0.0 END AS digit_ratio,
    CASE WHEN n_tokens > 0 THEN (n_chars - n_space) / n_tokens ELSE 0.0 END AS mtl
  FROM f)
SELECT doc_id, n_tokens,
  ROUND(0.35 * LEAST(n_tokens / 20.0, 1.0)
      + 0.35 * alpha_ratio
      + 0.15 * (CASE WHEN mtl >= 2 AND mtl <= 12 THEN 1.0 ELSE 0.3 END)
      + 0.15 * (1 - LEAST(digit_ratio * 4, 1.0)), 6) AS quality
FROM g
"""


def lang_id_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Marker-based language ID vs the labeled lang column — confusion counts."""
    docs = t(spark, sf, "documents")
    return (
        docs.select("lang", language_id(F.col("text")).alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n"))
    )


def _lang_confusion_sql() -> str:
    case_expr, best = _langid_sql_expr()
    return f"""
    WITH s AS (SELECT lang, {best} AS __best, text FROM documents)
    SELECT lang, {case_expr} AS lang_guess, COUNT(*) AS n
    FROM s GROUP BY 1, 2
    """


def exact_dup_groups(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    return exact_dedup(docs, "doc_id", "text")


EXACT_DUP_SQL = """
SELECT md5(lower(trim(regexp_replace(coalesce(text,''), '\\s+', ' ', 'g')))) AS fingerprint,
       MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1
"""


def minhash_signatures_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=3)
    return minhash_signatures(sh, num_hashes=16).withColumnRenamed("id", "doc_id")


def _minhash_sql(num_hashes: int = 16, n: int = 3) -> str:
    mins = ",\n  ".join(
        f"MIN(({a} * code + {b}) % {MERSENNE_P}) AS h{i}"
        for a, b, i in minhash_coefficients(num_hashes)
    )
    return f"""
    WITH norm AS (
      SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS words
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest(list_transform(
               generate_series(1, GREATEST(len(words) - {n - 1}, 1)),
               i -> array_to_string(words[i:i+{n - 1}], ' '))) AS shingle
      FROM norm),
    coded AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MERSENNE_P} AS code
      FROM sh)
    SELECT doc_id, {mins}
    FROM coded GROUP BY doc_id
    """


def ngram_jaccard_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, min_jaccard=0.5)


def _ngram_jaccard_sql(n: int = 3, min_j: float = 0.5) -> str:
    return f"""
    WITH norm AS (
      SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS words
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest(list_transform(
               generate_series(1, GREATEST(len(words) - {n - 1}, 1)),
               i -> array_to_string(words[i:i+{n - 1}], ' '))) AS shingle
      FROM norm),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           ROUND(shared / (sa.sz + sb.sz - shared), 6) AS jaccard
    FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    WHERE shared / (sa.sz + sb.sz - shared) >= {min_j}
    """


def _shingle_cte_sql(n: int = 3) -> str:
    """norm/sh CTEs shared by every shingle-based oracle — identical text
    normalization + word n-grams as functions.dedup.word_shingles."""
    return f"""
    norm AS (
      SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS words
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest(list_transform(
               generate_series(1, GREATEST(len(words) - {n - 1}, 1)),
               i -> array_to_string(words[i:i+{n - 1}], ' '))) AS shingle
      FROM norm)"""


def _simhash_sig_ctes(n: int = 3, seed: int = 42) -> str:
    """CTE chain ending in ``sig(doc_id, simhash)`` — the exact 60-bit SimHash
    of functions.dedup.simhash, bit for bit."""
    sums = ",\n        ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(SIMHASH_BITS)
    )
    return f"""
    WITH {_shingle_cte_sql(n)},
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle || '|{seed}'), 1, 15))::BIGINT AS h
      FROM sh),
    sums AS (
      SELECT doc_id,
        {sums}
      FROM hashed GROUP BY doc_id),
    sig AS (
      SELECT doc_id, ({sig})::BIGINT AS simhash FROM sums)"""


def _simhash_sql(n: int = 3, seed: int = 42) -> str:
    return _simhash_sig_ctes(n, seed) + "\n    SELECT doc_id, simhash FROM sig"


def _simhash_near_dups_sql(n: int = 3, seed: int = 42, max_hamming: int = 3) -> str:
    bpc = SIMHASH_BITS // SIMHASH_CHUNKS
    mask = (1 << bpc) - 1
    return f"""{_simhash_sig_ctes(n, seed)},
    ch AS (
      SELECT doc_id, simhash, ci, (simhash >> ({bpc} * ci)) & {mask} AS cv
      FROM (SELECT doc_id, simhash, unnest(generate_series(0, {SIMHASH_CHUNKS - 1})) AS ci FROM sig)),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sha, b.simhash AS shb
      FROM ch a JOIN ch b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, bit_count(xor(sha, shb))::INT AS hamming
    FROM pairs WHERE bit_count(xor(sha, shb)) <= {max_hamming}"""


def _lsh_cand_ctes(
    num_hashes: int = 16, bands: int = 4, rows_per_band: int = 4, n: int = 3
) -> str:
    """WITH chain ending in ``cand(id_a, id_b)`` — the MinHash signatures of
    _minhash_sql plus the polynomial band buckets of
    functions.dedup.poly_combine, defined ONCE and shared by
    _lsh_candidates_sql and _near_dup_jaccard_sql so the banding arithmetic
    cannot silently diverge between the two oracles."""
    mins = ",\n        ".join(
        f"MIN(({a} * code + {b}) % {MERSENNE_P}) AS h{i}"
        for a, b, i in minhash_coefficients(num_hashes)
    )

    def bucket_expr(b: int) -> str:
        acc = "0"
        for v in [str(b)] + [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]:
            acc = f"(({acc}) * {_POLY_M} + {v}) % {MERSENNE_P}"
        return acc

    stacked = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {bucket_expr(b)} AS bucket FROM sig"
        for b in range(bands)
    )
    return f"""
    WITH {_shingle_cte_sql(n)},
    coded AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MERSENNE_P} AS code
      FROM sh),
    sig AS (
      SELECT doc_id,
        {mins}
      FROM coded GROUP BY doc_id),
    stacked AS (
      {stacked}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM stacked a JOIN stacked b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id)"""


def _lsh_candidates_sql(
    num_hashes: int = 16, bands: int = 4, rows_per_band: int = 4, n: int = 3
) -> str:
    return _lsh_cand_ctes(num_hashes, bands, rows_per_band, n) + (
        "\n    SELECT id_a, id_b FROM cand"
    )


def near_dup_jaccard_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    return near_dup_jaccard(
        docs, "doc_id", "text", n=3, min_jaccard=0.5,
        num_hashes=16, bands=4, rows_per_band=4,
    )


def _near_dup_pairs_ctes(
    num_hashes: int = 16, bands: int = 4, rows_per_band: int = 4,
    n: int = 3, min_j: float = 0.5,
) -> str:
    """Shared LSH-candidates CTE chain (_lsh_cand_ctes) + exact Jaccard
    verification restricted to those candidates, ending in
    ``dup_pairs(id_a, id_b, jaccard)`` — shared by the pair oracle and the
    components oracle so the threshold arithmetic cannot diverge."""
    return _lsh_cand_ctes(num_hashes, bands, rows_per_band, n) + f""",
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    shared AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS shared
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2),
    dup_pairs AS (
      SELECT id_a, id_b, ROUND(shared / (sa.sz + sb.sz - shared), 6) AS jaccard
      FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE shared / (sa.sz + sb.sz - shared) >= {min_j})"""


def _near_dup_jaccard_sql(
    num_hashes: int = 16, bands: int = 4, rows_per_band: int = 4,
    n: int = 3, min_j: float = 0.5,
) -> str:
    return _near_dup_pairs_ctes(num_hashes, bands, rows_per_band, n, min_j) + (
        "\n    SELECT id_a, id_b, jaccard FROM dup_pairs"
    )


def _near_dup_components_sql(
    num_hashes: int = 16, bands: int = 4, rows_per_band: int = 4,
    n: int = 3, min_j: float = 0.5,
) -> str:
    """Connected components over dup_pairs as a recursive CTE: labels walk
    the (symmetrized) dup edges until fixpoint, min reachable id = the
    component. Base case seeds EVERY document with its own id, so isolated
    docs come out as singleton components. The WITH keyword of the shared
    chain is upgraded to WITH RECURSIVE (DuckDB allows non-recursive CTEs in
    a RECURSIVE chain)."""
    ctes = _near_dup_pairs_ctes(num_hashes, bands, rows_per_band, n, min_j)
    ctes = ctes.replace("WITH ", "WITH RECURSIVE ", 1)
    return ctes + """,
    dup_edges AS (
      SELECT id_a AS src, id_b AS dst FROM dup_pairs
      UNION SELECT id_b, id_a FROM dup_pairs),
    walk(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.label FROM walk w JOIN dup_edges e ON e.src = w.id),
    comp AS (
      SELECT id AS doc_id, MIN(label) AS component FROM walk GROUP BY id)
    SELECT c.doc_id, c.component,
           COUNT(*) OVER (PARTITION BY c.component) AS cluster_size,
           CAST(c.doc_id = c.component AS INT) AS is_canonical
    FROM comp c"""


def near_dup_components_q(spark: SparkSession, sf: str) -> DataFrame:
    """The last stage of the dedup pipeline: LSH candidates → exact-Jaccard
    verify (near_dup_jaccard) → connected components → one canonical doc per
    cluster (min doc_id). Output is the full keep/drop assignment table a
    training-data pipeline consumes: every doc gets its component label,
    cluster size, and an is_canonical flag. The component loop shuffles only
    the PAIR list (candidate-bounded, never corpus-sized); the corpus joins
    in once at the end, and the cluster_size window is one exchange keyed by
    component."""
    from pyspark.sql import Window

    docs = t(spark, sf, "documents")
    pairs = near_dup_jaccard(
        docs, "doc_id", "text", n=3, min_jaccard=0.5,
        num_hashes=16, bands=4, rows_per_band=4,
    )
    comp = connected_components(pairs).withColumnRenamed("id", "doc_id")
    assigned = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select("doc_id", F.coalesce("comp", F.col("doc_id")).alias("component"))
    )
    w = Window.partitionBy("component")
    return assigned.select(
        "doc_id",
        "component",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("component")).cast("int").alias("is_canonical"),
    )


def simhash_signatures_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=3)
    return simhash(sh).withColumnRenamed("id", "doc_id")


def simhash_near_dups_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=3)
    return simhash_near_pairs(simhash(sh), max_hamming=3)


def minhash_lsh_candidates_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=3)
    sigs = minhash_signatures(sh, num_hashes=16)
    return lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)


def doc_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition filters per document: duplicate-word fraction,
    duplicate-bigram fraction, and the token share of the single most
    frequent bigram. These are the standard "is this page boilerplate/spam"
    signals a training-data pipeline thresholds on before anything else.

    The per-row pieces (word split, distinct count, bigram synthesis) are
    higher-order JVM expressions; the mode count (max bigram frequency)
    goes through explode→two-level groupBy — one shuffle keyed by
    (doc_id, bigram), map-side combined, so cost at 100 TB is a linear
    scan plus one token-count-sized exchange, never per-row quadratic
    mode scans."""
    d = t(spark, sf, "documents")
    w = d.select(
        "doc_id", F.expr("filter(split(trim(text), '\\\\s+'), x -> x <> '')").alias("w")
    )
    # persist the shared subtree: the regex split + bigram transform is the
    # most expensive per-row work here and feeds BOTH the explode→groupBy
    # branch and the final join branch — without the persist it runs twice
    base = cycle_persist(
        "doc_repetition_base",
        w.select(
            "doc_id",
            F.size("w").alias("n_words"),
            F.expr("size(array_distinct(w))").alias("d_words"),
            F.expr(
                "CASE WHEN size(w) < 2 THEN array() "
                "ELSE transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1])) END"
            ).alias("grams"),
        ),
    )
    counts = (
        base.select("doc_id", F.explode("grams").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_g"), F.count("*").alias("d_g"), F.max("c").alias("m")
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.round((F.col("n_words") - F.col("d_words")) / F.col("n_words").cast("double"), 6).alias(
            "dup_word_frac"
        ),
        F.round(
            F.when(F.col("n_g") > 0, (F.col("n_g") - F.col("d_g")) / F.col("n_g").cast("double"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("dup_bigram_frac"),
        F.round(
            F.when(F.col("n_g") > 0, F.lit(2) * F.col("m") / F.col("n_words").cast("double"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
    )


DOC_REPETITION_SQL = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), base AS (
  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS d_words,
         CASE WHEN len(w) < 2 THEN []
              ELSE [w[i] || ' ' || w[i + 1] for i in range(1, len(w))] END AS grams
  FROM w
), c AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(grams) AS g FROM base)
  GROUP BY doc_id, g
), agg AS (
  SELECT doc_id, sum(c) AS n_g, count(*) AS d_g, max(c) AS m FROM c GROUP BY doc_id
)
SELECT base.doc_id, n_words,
       round((n_words - d_words) / n_words::DOUBLE, 6) AS dup_word_frac,
       round(CASE WHEN n_g > 0 THEN (n_g - d_g) / n_g::DOUBLE ELSE 0.0 END, 6)
         AS dup_bigram_frac,
       round(CASE WHEN n_g > 0 THEN 2 * m / n_words::DOUBLE ELSE 0.0 END, 6)
         AS top_bigram_frac
FROM base LEFT JOIN agg USING (doc_id)
"""


def decontamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination (functions/dedup.contaminated_ids): corpus
    docs sharing any word 3-gram with a deterministic "eval set" slice
    (doc_id % 97 = 0). Broadcast semi-join — the corpus side never
    shuffles."""
    docs = t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return contaminated_ids(corpus, bench, "doc_id", "text", n=3)


DECONTAMINATION_SQL = f"""
WITH {_shingle_cte_sql(3)},
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
SELECT DISTINCT doc_id FROM sh
WHERE doc_id % 97 <> 0 AND shingle IN (SELECT shingle FROM bench)
"""


def pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrubbing (functions/text.redact_pii + pii_counts). The synthetic
    docs carry no PII, so the query first injects a deterministic email/IP/
    phone per doc — identically in the oracle — then counts and redacts.
    Everything is chained regexp over one projection: scan-speed, no
    shuffle."""
    from ..functions.text import pii_counts, redact_pii

    docs = t(spark, sf, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" call +1-555-0100-999")).otherwise(
            F.lit("")
        ),
    )
    c = pii_counts(injected)
    return docs.select(
        "doc_id",
        c["email"].cast("long").alias("n_email"),
        c["ipv4"].cast("long").alias("n_ipv4"),
        c["phone"].cast("long").alias("n_phone"),
        F.md5(redact_pii(injected)).alias("redacted_md5"),
    )


def _pii_sql() -> str:
    from ..functions.text import PII_PATTERNS

    pats = {kind: (pat, repl) for kind, pat, repl in PII_PATTERNS}
    red = "itext"
    for kind in ("email", "ipv4", "phone"):
        pat, repl = pats[kind]
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    counts = ",\n  ".join(
        f"len(regexp_extract_all(itext, '{pats[kind][0]}'))::BIGINT AS n_{kind}"
        for kind in ("email", "ipv4", "phone")
    )
    return f"""
WITH inj AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com from 10.0.'
              || (doc_id % 256) || '.7'
              || CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-0100-999' ELSE '' END
           AS itext
  FROM documents)
SELECT doc_id,
  {counts},
  md5({red}) AS redacted_md5
FROM inj
"""


QUERIES = {
    "doc_stats_by_lang": doc_stats_by_lang,
    "doc_quality": doc_quality,
    "lang_id_confusion": lang_id_confusion,
    "exact_dup_groups": exact_dup_groups,
    "minhash_signatures_16": minhash_signatures_q,
    "ngram_jaccard_pairs": ngram_jaccard_q,
    "near_dup_jaccard_pairs": near_dup_jaccard_q,
    "near_dup_components": near_dup_components_q,
    "simhash_signatures": simhash_signatures_q,
    "simhash_near_dups": simhash_near_dups_q,
    "minhash_lsh_candidates": minhash_lsh_candidates_q,
    "doc_repetition": doc_repetition,
    "decontamination": decontamination,
    "pii_redaction": pii_redaction,
}

ORACLES = {
    "doc_stats_by_lang": DOC_STATS_SQL,
    "doc_quality": DOC_QUALITY_SQL,
    "lang_id_confusion": _lang_confusion_sql(),
    "exact_dup_groups": EXACT_DUP_SQL,
    "minhash_signatures_16": _minhash_sql(16, 3),
    "ngram_jaccard_pairs": _ngram_jaccard_sql(3, 0.5),
    "near_dup_jaccard_pairs": _near_dup_jaccard_sql(16, 4, 4, 3, 0.5),
    "near_dup_components": _near_dup_components_sql(16, 4, 4, 3, 0.5),
    "simhash_signatures": _simhash_sql(3, 42),
    "simhash_near_dups": _simhash_near_dups_sql(3, 42, 3),
    "minhash_lsh_candidates": _lsh_candidates_sql(16, 4, 4, 3),
    "doc_repetition": DOC_REPETITION_SQL,
    "decontamination": DECONTAMINATION_SQL,
    "pii_redaction": _pii_sql(),
}
