"""Regression tests for the round-2 review findings: NULL condition fields in
conditional lookups, map-typed columns through tie-break dedupe, uncorrelated
query sources, empty-batch export/transport hygiene, DST-proof durations."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from openmrs_module_epts_etl_spark.operators.joins import lookup_join
from openmrs_module_epts_etl_spark.operators.transcripts import conversation_stats
from openmrs_module_epts_etl_spark.operators.windows import latest_per_key
from openmrs_module_epts_etl_spark.prepared import QuerySourceConfig, apply_query_source
from openmrs_module_epts_etl_spark.sources.files import json_export, transport_batches


def test_conditional_lookup_null_condition_field_never_dropped(spark):
    """A NULL condition field does NOT match the condition — under
    required=True the row must pass through untouched, not be swallowed by
    three-valued logic."""
    facts = spark.createDataFrame(
        [(1, 7, 10), (2, None, 10), (3, 5, 10)],
        "id long, person_attribute_type_id long, value long",
    )
    dim = spark.createDataFrame([(10, "Gaza")], "value long, location_name string")
    out = {
        r["id"]: r
        for r in lookup_join(
            facts, dim, ["value"], how="inner",
            conditions={"person_attribute_type_id": 7},
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["location_name"] == "Gaza"
    assert out[2]["location_name"] is None  # NULL condition → untouched
    assert out[3]["location_name"] is None


def test_latest_per_key_with_map_column(spark):
    """tie_break dedupe must survive map-typed payload columns (unhashable /
    un-distinct-able in Spark) — a regression against the generic operator's
    pre-tie-break behavior."""
    df = spark.createDataFrame(
        [("a", 1, {"k": "v1"}), ("a", 2, {"k": "v2"}), ("a", 2, {"k": "v2"}),
         ("b", 1, {"x": "y"})],
        "key string, seq long, props map<string,string>",
    )
    out = latest_per_key(df, ["key"], "seq").collect()
    got = {r["key"]: (r["seq"], dict(r["props"])) for r in out}
    assert len(out) == 2  # byte-identical tie rows collapse to one winner
    assert got["a"] == (2, {"k": "v2"})
    assert got["b"] == (1, {"x": "y"})


def test_latest_per_key_user_column_named_h(spark):
    """A user column literally named __h must survive the tie-break hash."""
    df = spark.createDataFrame(
        [("a", 1, "keep-me"), ("a", 2, "latest")], "key string, seq long, __h string"
    )
    out = latest_per_key(df, ["key"], "seq").collect()
    assert len(out) == 1 and out[0]["__h"] == "latest"


def test_query_source_uncorrelated_attaches_to_every_row(spark, tmp_path):
    """A purely config-bound query has no join keys — the one related record
    must still attach to every source row (the reference's per-row find would
    return it for every row), not silently no-op."""
    src = spark.createDataFrame([(1,), (2,)], "id long")
    nation = spark.createDataFrame(
        [(5, "ETHIOPIA"), (6, "FRANCE")], "n_nationkey long, n_name string"
    )
    p = str(tmp_path / "nation.parquet")
    nation.write.parquet(p)
    qs = QuerySourceConfig(
        name="q", query="SELECT n_name FROM nation WHERE n_nationkey = @nk",
        resources={"nation": p},
    )
    out = apply_query_source(spark, src, qs, {"nk": 5}).orderBy("id").collect()
    assert [r["n_name"] for r in out] == ["ETHIOPIA", "ETHIOPIA"]

    # required + empty result ⇒ every row ignored (the per-row find found
    # nothing for each of them)
    qs_req = QuerySourceConfig(
        name="q", query="SELECT n_name FROM nation WHERE n_nationkey = @nk",
        resources={"nation": p}, required=True,
    )
    assert apply_query_source(spark, src, qs_req, {"nk": 99}).count() == 0


def test_empty_export_not_published_and_transport_skips_legacy(spark, tmp_path):
    export = str(tmp_path / "export")
    imp = str(tmp_path / "import")
    df = spark.range(5).select(F.col("id").cast("long").alias("id"))

    m = json_export(df.filter(F.col("id") < 0), export, "b-empty")
    assert m["rows"] == 0
    assert not os.path.exists(os.path.join(export, "b-empty"))  # never published
    # the tag stays free for a later export that has data
    m2 = json_export(df, export, "b-empty")
    assert m2["rows"] == 5

    # a hand-made/legacy empty batch must not wedge the transport loop
    legacy = os.path.join(export, "a-legacy-empty")
    os.makedirs(legacy)
    with open(os.path.join(legacy, "_minimal.json"), "w") as fh:
        fh.write('{"batch": "a-legacy-empty", "files": [], "rows": 0}')
    # a batch whose manifest LOST its rows key (corrupt / older producer) but
    # that still holds real part-files must be quarantined, never rmtree'd
    stale = os.path.join(export, "c-no-rows-key")
    os.makedirs(stale)
    with open(os.path.join(stale, "_minimal.json"), "w") as fh:
        fh.write('{"batch": "c-no-rows-key", "files": ["part-00000.json"]}')
    with open(os.path.join(stale, "part-00000.json"), "w") as fh:
        fh.write('{"id": 1}\n')

    moved = transport_batches(export, imp)
    assert [b["batch"] for b in moved] == ["b-empty"]
    assert not os.path.exists(legacy)  # removed, like the reference's delete
    assert os.path.isdir(os.path.join(imp, "b-empty"))
    assert not os.path.exists(stale)  # quarantined under .bad ...
    bad = stale + ".bad"
    assert os.path.isdir(bad)  # ... with the data preserved for inspection
    assert os.path.exists(os.path.join(bad, "part-00000.json"))
    # and a rerun neither re-quarantines nor re-transports it
    assert transport_batches(export, imp) == []
    assert os.path.isdir(bad) and not os.path.isdir(bad + ".bad")


def test_conversation_stats_duration_dst_proof(spark):
    """Durations spanning a DST transition must be wall-microsecond diffs of
    the stored values, never shifted ±3600s by the session timezone."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.sql(
            """SELECT * FROM VALUES
                 ('c1', 0, 'user', 'hi', CAST(NULL AS STRING),
                  TIMESTAMP_NTZ'2026-03-08 01:30:00'),
                 ('c1', 1, 'assistant', 'yo', CAST(NULL AS STRING),
                  TIMESTAMP_NTZ'2026-03-08 03:30:00')
               AS t(conv_id, turn_idx, role, text, tool, ts)"""
        )
        row = conversation_stats(df).collect()[0]
        assert row["duration_us"] == 2 * 3600 * 1_000_000  # naive diff, no DST shift
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_quarantine_rename_collision_gets_fresh_suffix(tmp_path):
    """A re-exported batch with the same deterministic name as an existing
    quarantine must land in .bad.1 (os.rename onto a non-empty dir raises,
    which would strand every later batch), and reruns must skip both."""
    export = str(tmp_path / "export")
    imp = str(tmp_path / "import")
    os.makedirs(export)

    def make_bad_batch():
        d = os.path.join(export, "b-0042")
        os.makedirs(d)
        with open(os.path.join(d, "_minimal.json"), "w") as fh:
            fh.write('{"batch": "b-0042", "files": ["part-00000.json"]}')
        with open(os.path.join(d, "part-00000.json"), "w") as fh:
            fh.write('{"id": 1}\n')

    make_bad_batch()
    assert transport_batches(export, imp) == []
    assert os.path.isdir(os.path.join(export, "b-0042.bad"))

    # same batch name re-exported, again unverifiable, plus a later valid
    # batch that must still transport
    make_bad_batch()
    ok = os.path.join(export, "c-0001")
    os.makedirs(ok)
    with open(os.path.join(ok, "_minimal.json"), "w") as fh:
        fh.write('{"batch": "c-0001", "files": ["part-00000.json"], "rows": 1}')
    with open(os.path.join(ok, "part-00000.json"), "w") as fh:
        fh.write('{"id": 2}\n')

    moved = transport_batches(export, imp)
    assert [b["batch"] for b in moved] == ["c-0001"]
    assert os.path.isdir(os.path.join(export, "b-0042.bad"))
    assert os.path.isdir(os.path.join(export, "b-0042.bad.1"))
    # rerun: nothing re-quarantined, nothing re-transported
    assert transport_batches(export, imp) == []
    assert not os.path.exists(os.path.join(export, "b-0042.bad.1.bad"))
