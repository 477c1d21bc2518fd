"""The committed BENCH.md may never contradict the session config it claims
to describe (round-3 finding: the artifact said bypassMergeThreshold=1 while
session.py set 64). The template now interpolates session.TUNED_TRANSPORT;
this test greps the committed artifact for agreement so a config change that
skips regenerating BENCH.md fails CI instead of shipping a lie."""

from __future__ import annotations

import os
import re

from openmrs_module_epts_etl_spark.session import STREAMING_TRANSPORT, TUNED_TRANSPORT

BENCH_MD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md")


def test_bench_md_transport_prose_matches_session_config():
    md = open(BENCH_MD).read()
    thr = TUNED_TRANSPORT["spark.shuffle.sort.bypassMergeThreshold"]
    stream_thr = STREAMING_TRANSPORT["spark.shuffle.sort.bypassMergeThreshold"]
    codec = TUNED_TRANSPORT["spark.io.compression.codec"]
    # every explicit bypassMergeThreshold value mentioned must be a live one:
    # the batch session's, or the streaming profile's (the stream-mor bench
    # row runs under STREAMING_TRANSPORT — the earlier batch-only assertion
    # structurally prevented BENCH.md from disclosing that; round-4 advice)
    cited = re.findall(r"bypassMergeThreshold=(\d+)", md)
    assert cited, "BENCH.md must state the shuffle-writer policy"
    assert all(v in (thr, stream_thr) for v in cited), (
        f"stale threshold in BENCH.md: {cited} not in ({thr}, {stream_thr})"
    )
    assert thr in cited, "BENCH.md must state the batch shuffle-writer crossover"
    if stream_thr != thr and stream_thr in cited:
        # a cited streaming value must be attributed to its session profile
        assert "STREAMING_TRANSPORT" in md
    assert codec in md, f"BENCH.md must name the live shuffle codec {codec!r}"


def test_bench_md_has_no_always_sort_writer_claim():
    md = open(BENCH_MD).read()
    assert "sort-based shuffle writer at every partition count" not in md
