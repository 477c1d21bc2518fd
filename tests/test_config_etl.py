"""Config-driven ETL (reference's JSON-config UX): extra condition, field
mappings/constants/nulls, dimension lookup with defaults, named vectorized
transformer, multi-destination fan-out, epoch fencing through the same MERGE."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from openmrs_module_epts_etl_spark.config import (
    EtlConfig,
    TRANSFORMERS,
    register_transformer,
    run_etl_item,
)
from openmrs_module_epts_etl_spark.lake import LakeTable, identity
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@register_transformer("uppercase_status")
def _upper(df):
    return df.withColumn("status", F.upper(F.col("status")))


@pytest.fixture()
def setup(spark, tmp_path):
    src = spark.createDataFrame(
        [
            (1, 10, "a", 5.0, "open"),
            (2, 10, "b", 6.0, "closed"),
            (3, 99, "c", 7.0, "open"),  # missing dim → default
            (4, 20, "d", 8.0, "void"),  # filtered by extraCondition
        ],
        "id long, dim_id long, name string, val double, status string",
    )
    src_path = str(tmp_path / "src.parquet")
    src.write.parquet(src_path)
    dim = spark.createDataFrame(
        [(10, "north"), (20, "south")], "dim_id long, region string"
    )
    dim_path = str(tmp_path / "dim.parquet")
    dim.write.parquet(dim_path)

    dst_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("region", StringType()),
            StructField("status", StringType()),
            StructField("source_tag", StringType()),
            StructField("_lsn", LongType()),
            StructField("_origin", StringType()),
            StructField(
                "_deleted", __import__("pyspark.sql.types", fromlist=["BooleanType"]).BooleanType()
            ),
        ]
    )
    t1 = LakeTable.create(spark, str(tmp_path / "t1"), dst_schema, [])
    audit_schema = StructType(
        [StructField("id", LongType()), StructField("val", DoubleType())]
    )
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), audit_schema, [])

    cfg = {
        "processName": "demo",
        "items": [
            {
                "name": "src_to_t1_t2",
                "srcPath": src_path,
                "extraConditionForExtract": "status != 'void'",
                "transformer": "uppercase_status",
                "lookups": [
                    {
                        "path": dim_path,
                        "keys": ["dim_id"],
                        "select": ["region"],
                        "defaults": {"region": "UNKNOWN"},
                    }
                ],
                "dsts": [
                    {
                        "tablePath": t1.path,
                        "mode": "merge",
                        "key": ["id"],
                        "mappings": [
                            {"dst": "id"},
                            {"dst": "name"},
                            {"dst": "region"},
                            {"dst": "status"},
                            {"dst": "source_tag", "srcValue": "etl-demo"},
                        ],
                    },
                    {
                        "tablePath": t2.path,
                        "mode": "append",
                        "mappings": [{"dst": "id"}, {"dst": "val"}],
                    },
                ],
            }
        ],
    }
    return EtlConfig.from_json(json.dumps(cfg)), t1, t2


def test_config_etl_end_to_end(spark, setup):
    cfg, t1, t2 = setup
    item = cfg.items[0]
    out = run_etl_item(spark, item, epoch_id=0)
    rows = {r["id"]: r for r in t1.refresh().read().collect()}
    assert set(rows) == {1, 2, 3}  # 'void' filtered out
    assert rows[1]["region"] == "north"
    assert rows[3]["region"] == "UNKNOWN"  # default due inconsistency
    assert rows[2]["status"] == "CLOSED"  # transformer applied
    assert all(r["source_tag"] == "etl-demo" for r in rows.values())
    assert t2.refresh().read().count() == 3  # fan-out second destination
    assert out[t1.path].get("insert") == 3

    # replay same epoch: fenced on both destinations
    v1, v2 = t1.version, t2.version
    run_etl_item(spark, item, epoch_id=0)
    assert t1.refresh().version == v1
    # append dst is fenced too
    assert t2.refresh().read().count() == 3


def test_required_lookup_drops_rows(spark, setup, tmp_path):
    cfg, t1, t2 = setup
    item = cfg.items[0]
    item.lookups[0].required = True
    item.dsts = [item.dsts[0]]
    item.dsts[0].table_path = str(
        LakeTable.create(
            spark, str(tmp_path / "t3"), t1.schema, []
        ).path
    )
    out = run_etl_item(spark, item, epoch_id=1)
    t3 = LakeTable(spark, item.dsts[0].table_path)
    ids = {r["id"] for r in t3.read().collect()}
    assert ids == {1, 2}  # row 3 dropped (required lookup missed)


def test_config_conflict_policy_parse_and_apply(spark, setup, tmp_path):
    # conflictResolution block (README.md:304-309 analog) parses into a
    # ConflictPolicy and governs the merge across epochs
    cfg, t1, t2 = setup
    item = cfg.items[0]
    item.dsts = [item.dsts[0]]
    item.dsts[0].table_path = str(
        LakeTable.create(spark, str(tmp_path / "t_keep"), t1.schema, []).path
    )
    parsed = EtlConfig.from_json(
        json.dumps(
            {
                "processName": "p",
                "items": [
                    {
                        "name": "i",
                        "srcPath": "unused",
                        "dsts": [
                            {
                                "tablePath": "unused",
                                "conflictResolution": {"type": "KEEP_EXISTING"},
                            }
                        ],
                    }
                ],
            }
        )
    )
    assert parsed.items[0].dsts[0].policy.kind == "keep_existing"

    item.dsts[0].policy = parsed.items[0].dsts[0].policy
    run_etl_item(spark, item, epoch_id=0)
    tk = LakeTable(spark, item.dsts[0].table_path)
    before = {r["id"]: r["status"] for r in tk.read().collect()}
    # second epoch re-sends the same rows (higher synthesized lsn) — with
    # KEEP_EXISTING every matched row is kept, not overwritten
    out = run_etl_item(spark, item, epoch_id=1)
    assert out[item.dsts[0].table_path].get("policy_keep") == len(before)
    after = {r["id"]: r["status"] for r in tk.refresh().read().collect()}
    assert after == before


# ---------------------------------------------------------------- round 2:
# @param templating / extraQueryDataSource / conditionalFields / field
# transformers (VERDICT r01 items 3, 4, 7)
from openmrs_module_epts_etl_spark.config import (  # noqa: E402
    register_field_transformer,
    build_item_frame,
)
from openmrs_module_epts_etl_spark.prepared import (  # noqa: E402
    QuerySourceConfig,
    UnboundParamError,
    apply_query_source,
    parse_prepared_query,
)


def test_parse_prepared_query_contexts():
    # the 4 ParameterContextType contexts (README.md:251-256)
    pq = parse_prepared_query(
        "SELECT @uuid AS src_uuid, obs_value FROM @obs_table "
        "WHERE person_id = @person_id AND concept_id = @concept AND voided = 0",
        {"obs_table": "obs", "concept": 7},
    )
    assert pq.table == "obs"                         # DB_RESOURCE (config)
    assert pq.select_binds == [("src_uuid", "uuid")]  # SELECT_FIELD (row)
    assert pq.join_pairs == [("person_id", "person_id")]  # COMPARE (row)
    assert "concept_id = 7" in pq.where              # COMPARE (config literal)
    assert "voided = 0" in pq.where
    assert pq.select_items == ["obs_value"]

    pq2 = parse_prepared_query("SELECT x FROM t WHERE a IN (@key)", {})
    assert pq2.join_pairs == [("a", "key")]          # IN_CLAUSE (row)

    with pytest.raises(UnboundParamError):
        parse_prepared_query("SELECT x FROM t WHERE a > @p", {})
    with pytest.raises(UnboundParamError):
        parse_prepared_query("SELECT x FROM @missing", {})


def test_query_source_join_semantics(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, 100, "u1"), (2, 200, "u2"), (3, 999, "u3")],
        "id long, person_id long, uuid string",
    )
    obs = spark.createDataFrame(
        [(100, 7, "loc-A", 0), (100, 8, "other", 0), (200, 7, "loc-B", 1)],
        "person_id long, concept_id long, obs_value string, voided int",
    )
    obs_path = str(tmp_path / "obs.parquet")
    obs.write.parquet(obs_path)

    qs = QuerySourceConfig(
        name="locsrc",
        query="SELECT obs_value, @uuid AS src_uuid FROM obs "
              "WHERE person_id = @person_id AND concept_id = @concept AND voided = 0",
        resources={"obs": obs_path},
    )
    out = apply_query_source(spark, src, qs, {"concept": 7}).orderBy("id").collect()
    # row 1: matched (concept 7, voided 0); row 2: only voided candidate →
    # no match; row 3: no person → left join keeps the row with NULLs
    assert [r["obs_value"] for r in out] == ["loc-A", None, None]
    assert [r["src_uuid"] for r in out] == ["u1", "u2", "u3"]  # SELECT_FIELD binds row value
    assert len(out) == 3

    # required=True ⇒ inner join: unmatched rows are ignored
    qs_req = QuerySourceConfig(name="q", query=qs.query, resources=qs.resources, required=True)
    ids = {r["id"] for r in apply_query_source(spark, src, qs_req, {"concept": 7}).collect()}
    assert ids == {1}


def test_query_source_unique_multi_match_deterministic(spark, tmp_path):
    src = spark.createDataFrame([(1, 100)], "id long, person_id long")
    obs = spark.createDataFrame(
        [(100, "b-second"), (100, "a-first")], "person_id long, obs_value string"
    )
    p = str(tmp_path / "obs2.parquet")
    obs.write.parquet(p)
    qs = QuerySourceConfig(
        name="q", query="SELECT obs_value FROM obs WHERE person_id = @person_id",
        resources={"obs": p},
    )
    out = apply_query_source(spark, src, qs, {}).collect()
    # DAO.find contract: ONE related record per row, deterministically chosen
    assert len(out) == 1 and out[0]["obs_value"] == "a-first"


def test_conditional_lookup(spark, tmp_path):
    # person_attribute_type_id=7-style conditional parent
    # (db_quick_merge_gaza.json:168-173)
    src = spark.createDataFrame(
        [
            (1, 7, 10),   # condition matches, parent exists
            (2, 7, 99),   # condition matches, parent MISSING → default
            (3, 5, 10),   # condition does not match → untouched, no default
        ],
        "id long, person_attribute_type_id long, value long",
    )
    src_path = str(tmp_path / "pa.parquet")
    src.write.parquet(src_path)
    loc = spark.createDataFrame([(10, "Gaza")], "value long, location_name string")
    loc_path = str(tmp_path / "loc.parquet")
    loc.write.parquet(loc_path)

    cfg = EtlConfig.from_json(json.dumps({
        "processName": "p",
        "items": [{
            "name": "i", "srcPath": src_path,
            "lookups": [{
                "path": loc_path, "keys": ["value"],
                "select": ["location_name"],
                "defaults": {"location_name": "UNKNOWN"},
                "conditionalFields": [{"name": "person_attribute_type_id", "value": 7}],
            }],
            "dsts": [],
        }],
    }))
    out = {r["id"]: r for r in build_item_frame(spark, cfg.items[0]).collect()}
    assert out[1]["location_name"] == "Gaza"
    assert out[2]["location_name"] == "UNKNOWN"   # default only where condition holds
    assert out[3]["location_name"] is None        # parent not loaded at all
    assert set(out) == {1, 2, 3}

    # required + conditional: drop ONLY matching rows with a missing parent
    cfg.items[0].lookups[0].required = True
    out2 = {r["id"] for r in build_item_frame(spark, cfg.items[0]).collect()}
    assert out2 == {1, 3}


@register_field_transformer("mask_name", kind="column")
def _mask(c):
    return F.concat(F.substring(c, 1, 1), F.lit("***"))


def test_field_transformers_through_run_etl_item(spark, setup, tmp_path):
    cfg, t1, t2 = setup
    item = cfg.items[0]
    item.dsts = [item.dsts[0]]
    item.dsts[0].table_path = str(
        LakeTable.create(spark, str(tmp_path / "t_ft"), t1.schema, []).path
    )
    # per-field transformer on the mapping (EtlFieldTransformer analog)
    item.dsts[0].mappings[1].transformer = "mask_name"
    run_etl_item(spark, item, epoch_id=0)
    got = {r["id"]: r["name"] for r in
           LakeTable(spark, item.dsts[0].table_path).read().collect()}
    assert got == {1: "a***", 2: "b***", 3: "c***"}


def test_pandas_field_transformer(spark, tmp_path):
    # nested fn → cloudpickle serializes it by value (a module-level test
    # function would be pickled by reference and fail to import on workers)
    register_field_transformer("double_val", kind="pandas", return_type="double")(
        lambda s: s * 2.0
    )
    src = spark.createDataFrame([(1, 2.5), (2, 4.0)], "id long, val double")
    p = str(tmp_path / "ft_src.parquet")
    src.write.parquet(p)
    cfg = EtlConfig.from_json(json.dumps({
        "processName": "p",
        "items": [{"name": "i", "srcPath": p, "dsts": [{
            "tablePath": "unused", "mappings": [
                {"dst": "id"},
                {"dst": "val", "transformer": "double_val"},
            ]}]}],
    }))
    from openmrs_module_epts_etl_spark.config import project_for_dst
    df = project_for_dst(build_item_frame(spark, cfg.items[0]), cfg.items[0].dsts[0])
    assert {r["id"]: r["val"] for r in df.collect()} == {1: 5.0, 2: 8.0}


def test_global_params_in_extra_condition(spark, tmp_path):
    src = spark.createDataFrame([(1, "x"), (2, "y")], "id long, tag string")
    p = str(tmp_path / "gp_src.parquet")
    src.write.parquet(p)
    cfg = EtlConfig.from_json(json.dumps({
        "processName": "p",
        "params": {"wanted": "x"},
        "items": [{"name": "i", "srcPath": p,
                   "extraConditionForExtract": "tag = @wanted", "dsts": []}],
    }))
    rows = build_item_frame(spark, cfg.items[0], cfg.params).collect()
    assert [r["id"] for r in rows] == [1]
