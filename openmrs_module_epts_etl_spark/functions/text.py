"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All native ``pyspark.sql.functions`` expressions — JVM-side, whole-stage
codegen, no Python in the hot path. At 100 TB these run at scan speed with
column pruning (only ``text`` is read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Deliberately small + space-delimited so the same logic is expressible in the
# DuckDB oracle (occurrence counting via length/replace arithmetic).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " die ", " und ", " ist "],
    "fr": [" le ", " la ", " et ", " les "],
    "es": [" el ", " que ", " los ", " una "],
}


def token_count(text: Column) -> Column:
    """Whitespace tokenization; empty/null-safe. A BPE-ish sub-word estimate
    is ``ceil(chars/4)`` — provided as ``token_count_bpe_ish``."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def token_count_bpe_ish(text: Column) -> Column:
    return F.ceil(F.length(F.coalesce(text, F.lit(""))) / F.lit(4.0)).cast("long")


def _occurrences(text: Column, marker: str) -> Column:
    """Count non-overlapping occurrences via length arithmetic — identical
    semantics in Spark and ANSI SQL (oracle-friendly, no regex dialects)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def quality_features(text: Column) -> dict[str, Column]:
    t = F.coalesce(text, F.lit(""))
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    n_space = F.length(F.regexp_replace(t, r"[^ ]", ""))
    mean_token_len = F.when(n_tokens > 0, (n_chars - n_space) / n_tokens).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0)),
        "digit_ratio": F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "mean_token_len": mean_token_len,
    }


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: long-enough, mostly alphabetic, sane token lengths,
    not digit/punct spam. Weights are arbitrary but deterministic."""
    f = quality_features(text)
    len_ok = F.least(f["n_tokens"] / F.lit(20.0), F.lit(1.0))
    tok_ok = F.when((f["mean_token_len"] >= 2) & (f["mean_token_len"] <= 12), 1.0).otherwise(0.3)
    return F.round(
        0.35 * len_ok
        + 0.35 * f["alpha_ratio"]
        + 0.15 * tok_ok
        + 0.15 * (1 - F.least(f["digit_ratio"] * 4, F.lit(1.0))),
        6,
    )


def language_id(text: Column) -> Column:
    """Marker-n-gram language heuristic over {en,de,fr,es,zh}: zh if CJK
    codepoints dominate, else the language whose stopword markers occur most
    (ties → 'und' unknown/undetermined)."""
    t = F.concat(F.lit(" "), F.lower(F.coalesce(text, F.lit(""))), F.lit(" "))
    cjk = F.length(F.regexp_replace(t, r"[^一-鿿]", ""))
    scores = [
        (lang, sum_cols([_occurrences(t, m) for m in markers]))
        for lang, markers in LANG_MARKERS.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    for lang, s in reversed(scores):
        guess = F.when(s == best_score, F.lit(lang)).otherwise(guess)
    return (
        F.when(cjk * 2 > F.length(F.trim(t)), F.lit("zh"))
        .when(best_score <= 0, F.lit("und"))
        .otherwise(guess)
    )


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def doc_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of whitespace-normalized,
    lowercased text. Stable across engines (md5 is md5 everywhere) — the
    exact-dedup and fingerprint-join key."""
    norm = F.lower(F.trim(F.regexp_replace(F.coalesce(text, F.lit("")), r"\s+", " ")))
    return F.md5(norm)


# Rabin-Karp rolling min-hash parameters. B/P sized so every intermediate
# stays inside int64 on BOTH engines (h < P ~ 2^31, |h - c·B^{k-1}|·B < 2^60)
# — the same portability discipline as the md5-derived codes in dedup.py.
RK_WINDOW = 8
RK_BASE = 257
RK_P = (1 << 31) - 1
_RK_BK1 = pow(RK_BASE, RK_WINDOW - 1, RK_P)
_M31 = 1 << 31


def with_rolling_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "rk_fingerprint"
) -> DataFrame:
    """Add the minimum Rabin-Karp hash over every ``RK_WINDOW``-char window —
    a winnowing-style content fingerprint (stable under small appends) at
    O(1) arithmetic per character, vs one md5 digest per character position
    for the md5-min-shingle variant (digest setup dominates there).

    Two projections, zero shuffles: the char-code array is materialized ONCE
    per row (``split`` + ``transform``) so the fold's three references to it
    are O(1) array reads, then a single ``aggregate`` fold carries a
    (hash, min) accumulator packed into one BIGINT (h·2³¹ + m); the per-step
    hash binds once via a 1-element ``transform`` (poor man's let). Texts
    shorter than the window hash their full content. The identical
    arithmetic runs in the DuckDB oracle via ``list_reduce``
    (plans/ops_queries.py) — same portability discipline as dedup.py's
    md5-derived codes.
    """
    k, b, p, bk1, m31 = RK_WINDOW, RK_BASE, RK_P, _RK_BK1, _M31
    m0 = m31 - 1
    cs = "__rk_cs"
    hexpr = (
        f"pmod(CASE WHEN i <= {k} THEN (acc div {m31}) * {b} + {cs}[i-1] "
        f"ELSE ((acc div {m31}) - cast({cs}[i-1-{k}] as bigint) * {bk1}) * {b} + {cs}[i-1] "
        f"END, {p})"
    )
    fold = f"""
    aggregate(
      sequence(1, size({cs})),
      cast({m0} as bigint),
      (acc, i) -> transform(array({hexpr}),
          hh -> hh * cast({m31} as bigint)
                + least(acc % {m31},
                        CASE WHEN i >= {k} OR i = size({cs}) THEN hh
                             ELSE {m0} END))[0]
    ) % {m31}
    """
    # Empty/NULL text → NULL, normalized in BOTH engines: Spark's
    # split('', '') yields [''] (fingerprint 0) while DuckDB's
    # string_split yields [] (the fold seed) — divergent garbage either way.
    return (
        df.withColumn(cs, F.expr(f"transform(split(`{text_col}`, ''), ch -> ascii(ch))"))
        .withColumn(
            out_col,
            F.when(F.length(F.col(text_col)) > 0, F.expr(fold)),
        )
        .drop(cs)
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB oracle): no backrefs, no lookaround. Order matters — emails
# are redacted before the bare-IP pattern could eat a dotted hostname.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]\d{2,4}[ -]\d{3,4}[ -]\d{3,4}", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Scrub emails / IPv4s / international phone numbers, each replaced by a
    typed placeholder. Pure chained ``regexp_replace`` — JVM-side, codegen'd,
    scan-speed; the mandatory scrubbing pass of a training-data pipeline."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (``regexp_count`` — same engine pass as the
    redaction; use for audit metrics / thresholding leaky documents)."""
    return {kind: F.regexp_count(text, F.lit(pat)) for kind, pat, _ in PII_PATTERNS}


def with_text_analysis(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → documents + analysis columns (one projection, no shuffle)."""
    t = F.col(text_col)
    feats = quality_features(t)
    return df.select(
        "*",
        feats["n_tokens"].alias("n_tokens"),
        token_count_bpe_ish(t).alias("n_tokens_bpe_ish"),
        F.round(feats["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
        quality_score(t).alias("quality"),
        language_id(t).alias("lang_guess"),
        doc_fingerprint(t).alias("fingerprint"),
    )
