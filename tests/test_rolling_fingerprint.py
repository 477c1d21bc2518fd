"""Rabin-Karp rolling fingerprint vs an independent pure-python oracle,
including short/empty-text edges and the append-stability property the
winnowing fingerprint exists for."""

from __future__ import annotations

from openmrs_module_epts_etl_spark.functions.text import (
    RK_BASE,
    RK_P,
    RK_WINDOW,
    with_rolling_fingerprint,
)

_BK1 = pow(RK_BASE, RK_WINDOW - 1, RK_P)


def _oracle(text: str) -> int | None:
    if not text:
        return None  # normalized edge: empty/NULL text fingerprints to NULL
    h, m, n = 0, None, len(text)
    cs = [ord(c) for c in text]
    for i in range(1, n + 1):
        if i <= RK_WINDOW:
            h = (h * RK_BASE + cs[i - 1]) % RK_P
        else:
            h = ((h - cs[i - 1 - RK_WINDOW] * _BK1) * RK_BASE + cs[i - 1]) % RK_P
        if i >= RK_WINDOW or i == n:
            m = h if m is None else min(m, h)
    return m


def test_rolling_fingerprint_matches_python_oracle(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaa",
        "short",          # shorter than the window
        "exactly8!",      # window + 1
        "12345678",       # exactly one window
        "x",
        "",               # empty → NULL in Spark AND the DuckDB oracle
        None,             # NULL propagates
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    got = {r.id: r.rk_fingerprint for r in with_rolling_fingerprint(df).collect()}
    for i, t in enumerate(texts):
        want = _oracle(t) if t is not None else None
        assert got[i] == want, (t, got[i], want)


def test_rolling_fingerprint_empty_matches_duckdb_oracle(spark):
    """The driver-shaped check for the edge the testdata never exercises:
    Spark's with_rolling_fingerprint and the DuckDB DOC_FINGERPRINTS_SQL must
    agree on empty text (both NULL — Spark's split('','') yields [''] while
    DuckDB's string_split yields [], so the un-normalized folds diverge)."""
    import duckdb
    import pandas as pd

    from openmrs_module_epts_etl_spark.plans.ops_queries import DOC_FINGERPRINTS_SQL

    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["", "non-empty text here"]})
    con = duckdb.connect()
    con.register("documents", docs)
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT doc_id, rk_fingerprint FROM ({DOC_FINGERPRINTS_SQL})"
        ).fetchall()
    }
    df = spark.createDataFrame(docs)
    got = {r.doc_id: r.rk_fingerprint for r in with_rolling_fingerprint(df).collect()}
    assert got == want
    assert got[1] is None


def test_rolling_fingerprint_stable_under_append(spark):
    """The winnowing property: appending a suffix can only ADD windows, so
    the min over windows never increases — a shared prefix keeps a chance of
    an identical fingerprint, unlike a whole-document hash."""
    base = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [(0, base), (1, base + " PS: one more line of text")],
        "id int, text string",
    )
    got = {r.id: r.rk_fingerprint for r in with_rolling_fingerprint(df).collect()}
    assert got[1] <= got[0]
    assert got[0] == _oracle(base)
