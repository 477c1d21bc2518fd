"""Config-driven ETL: the reference's JSON-configuration surface re-expressed.

The reference is driven by a JSON config (EtlConfiguration,
api:conf/EtlConfiguration.java:44-132) defining src→dst table mappings with
field mappings, constants, extra conditions, transformers, and multi-
destination fan-out (api:conf/DstConf.java:562-670;
api:controller/conf/tablemapping/FieldsMapping.java:101-192). This module
keeps that UX — declare the pipeline as data — while the execution is a
Catalyst plan:

- ``extraConditionForExtract`` → ``df.filter(expr)``
  (api:engine/AbstractEtlSearchParams.java:104-117)
- auto same-name field mapping + explicit rename mapping → ``select/alias``
  (api:conf/DstConf.java:599-616)
- ``srcValue`` constants / ``mapToNullValue`` → ``lit()`` / ``lit(None)``
  (FieldsMapping.java:101-107, 186-192)
- record transformer plugin → a named **vectorized** transform from a
  registry (mapInPandas / native fn), never per-row Python
  (api:etl/processor/transformer/EtlRecordTransformer.java)
- multi-dst fan-out: one source batch → N destinations in declared order,
  abort on first failure (api:etl/processor/EtlProcessor.java:64-78)
- dimension joins with defaults (parent remap,
  api:etl/model/LoadRecord.java:230-304) → operators.joins.lookup_join
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc.conflict import ConflictPolicy
from .prepared import QuerySourceConfig, apply_query_source

# Registry of named record transformers (the plugin point). Each entry is a
# Callable[[DataFrame], DataFrame] built from vectorized primitives.
TRANSFORMERS: dict[str, Callable[[DataFrame], DataFrame]] = {}


def register_transformer(name: str):
    def deco(fn: Callable[[DataFrame], DataFrame]):
        TRANSFORMERS[name] = fn
        return fn

    return deco


# Per-FIELD transformer plugin point (EtlFieldTransformer analog,
# api:etl/processor/transformer/EtlFieldTransformer.java, wired per mapping
# at api:controller/conf/tablemapping/FieldsMapping.java:159-161). The
# reference calls transform() once per row per field; here an entry is either
# - kind="column": Callable[[Column], Column] — a JVM-side expression
#   rewrite (the fast path, whole-stage codegen), or
# - kind="pandas": Callable[[pd.Series], pd.Series] + a return type — wrapped
#   in a vectorized Arrow-batched pandas_udf. Never per-row Python.
FIELD_TRANSFORMERS: dict[str, tuple[str, Callable, str]] = {}


def register_field_transformer(name: str, kind: str = "column", return_type: str = "string"):
    if kind not in ("column", "pandas"):
        raise ValueError(f"unknown field-transformer kind: {kind}")

    def deco(fn):
        FIELD_TRANSFORMERS[name] = (kind, fn, return_type)
        return fn

    return deco


def _apply_field_transformer(name: str, c):
    kind, fn, return_type = FIELD_TRANSFORMERS[name]
    if kind == "column":
        return fn(c)
    # wrap lazily: pandas_udf needs an active session (Arrow conf lookup)
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(return_type)(fn)(c)


@dataclass
class FieldMapping:
    dst: str
    src: str | None = None          # same-name copy / rename
    src_value: object | None = None  # constant (srcValue)
    map_to_null: bool = False        # mapToNullValue
    cast: str | None = None
    transformer: str | None = None   # name in FIELD_TRANSFORMERS

    def expr(self):
        if self.map_to_null:
            c = F.lit(None)
        elif self.src_value is not None:
            c = F.lit(self.src_value)
        else:
            c = F.col(self.src or self.dst)
        if self.transformer:
            c = _apply_field_transformer(self.transformer, c)
        if self.cast:
            c = c.cast(self.cast)
        return c.alias(self.dst)


@dataclass
class LookupConfig:
    """Parent/dimension resolution (extraTableDataSource + parent remap)."""

    path: str                        # parquet path or lake table dir
    keys: list[str]
    select: list[str] = field(default_factory=list)
    defaults: dict = field(default_factory=dict)  # defaultValueDueInconsistency
    required: bool = False           # required=true ⇒ inner join (drop row)
    # conditionalFields (api:etl/model/LoadRecord.java:313-330): resolve the
    # parent only for rows whose fields equal these values; other rows pass
    # through untouched (see operators.joins.lookup_join)
    conditions: dict = field(default_factory=dict)


@dataclass
class DstConfig:
    table_path: str
    mode: str = "merge"              # merge | append
    key: list[str] = field(default_factory=lambda: ["conv_id", "turn_idx"])
    mappings: list[FieldMapping] = field(default_factory=list)
    # change-feed column names; when absent from the projected frame the
    # adapter synthesizes them (op='I', lsn=epoch, origin=item name), giving
    # the reference's plain upsert-ETL semantics over the same MERGE path
    lsn_col: str = "lsn"
    op_col: str = "op"
    origin_col: str = "origin"
    # conflictResolutionType / winningRecordFieldsInfo / observationDateFields
    # (README.md:304-309) → cdc.conflict.ConflictPolicy; None = newer-wins
    policy: ConflictPolicy | None = None


@dataclass
class EtlItemConfig:
    """One src→[dst...] item (EtlItemConfiguration)."""

    name: str
    src_path: str
    extra_condition: str | None = None      # extraConditionForExtract
    transformer: str | None = None          # name in TRANSFORMERS
    lookups: list[LookupConfig] = field(default_factory=list)
    query_sources: list[QuerySourceConfig] = field(default_factory=list)
    dsts: list[DstConfig] = field(default_factory=list)


@dataclass
class EtlConfig:
    process_name: str
    items: list[EtlItemConfig]
    # global configuration parameters — the first @param binding source
    # (README.md:258-260; api:conf/PreparedQuery.java loadQueryParamValues)
    params: dict = field(default_factory=dict)

    @staticmethod
    def _parse_policy(d: dict | None) -> ConflictPolicy | None:
        """``{"type": "KEEP_EXISTING"}`` /
        ``{"type": "WINNING_FIELDS", "winningFields": [{"role": "assistant"}]}`` /
        ``{"type": "OBSERVATION_DATES", "observationDateFields": ["ts"]}`` —
        the reference's conflict config keys, case-insensitive."""
        if not d:
            return None
        return ConflictPolicy(
            kind=d.get("type", "newer_wins").lower(),
            winning_groups=tuple(d.get("winningFields", [])),
            observation_fields=tuple(d.get("observationDateFields", [])),
        )

    @staticmethod
    def _parse_conditions(raw) -> dict:
        """conditionalFields arrives as ``[{"name": ..., "value": ...}]`` in
        the reference's JSON (db_quick_merge_gaza.json:168-173) or as a plain
        dict here."""
        if not raw:
            return {}
        if isinstance(raw, dict):
            return dict(raw)
        return {c["name"]: c["value"] for c in raw}

    @staticmethod
    def from_json(path_or_str: str) -> "EtlConfig":
        if path_or_str.strip().startswith("{"):
            d = json.loads(path_or_str)
        else:
            with open(path_or_str) as fh:
                d = json.load(fh)
        items = []
        for it in d["items"]:
            items.append(
                EtlItemConfig(
                    name=it["name"],
                    src_path=it["srcPath"],
                    extra_condition=it.get("extraConditionForExtract"),
                    transformer=it.get("transformer"),
                    lookups=[
                        LookupConfig(
                            path=lk["path"],
                            keys=lk["keys"],
                            select=lk.get("select", []),
                            defaults=lk.get("defaults", {}),
                            required=lk.get("required", False),
                            conditions=EtlConfig._parse_conditions(lk.get("conditionalFields")),
                        )
                        for lk in it.get("lookups", [])
                    ],
                    query_sources=[
                        QuerySourceConfig(
                            name=q["name"],
                            query=q["query"],
                            resources=q.get("resources", {}),
                            required=q.get("required", False),
                        )
                        for q in it.get("extraQueryDataSource", [])
                    ],
                    dsts=[
                        DstConfig(
                            table_path=dc["tablePath"],
                            mode=dc.get("mode", "merge"),
                            key=dc.get("key", ["conv_id", "turn_idx"]),
                            mappings=[
                                FieldMapping(
                                    dst=m["dst"],
                                    src=m.get("src"),
                                    src_value=m.get("srcValue"),
                                    map_to_null=m.get("mapToNullValue", False),
                                    cast=m.get("cast"),
                                    transformer=m.get("transformer"),
                                )
                                for m in dc.get("mappings", [])
                            ],
                            policy=EtlConfig._parse_policy(dc.get("conflictResolution")),
                        )
                        for dc in it["dsts"]
                    ],
                )
            )
        return EtlConfig(process_name=d["processName"], items=items, params=d.get("params", {}))


def build_item_frame(
    spark: SparkSession, item: EtlItemConfig, params: dict | None = None
) -> DataFrame:
    """src scan → extra condition → lookups → query sources → transformer
    (pre-mapping). ``params`` are the global config parameters — substituted
    into extraConditionForExtract and query-source @params before planning."""
    from .operators.joins import lookup_join
    from .prepared import _PARAM, sql_literal
    import re as _re

    df = spark.read.parquet(item.src_path)
    if item.extra_condition:
        cond = item.extra_condition
        if params:
            cond = _re.sub(
                _PARAM,
                lambda m: sql_literal(params[m.group(1)]) if m.group(1) in params else m.group(0),
                cond,
            )
        df = df.filter(F.expr(cond))
    for lk in item.lookups:
        dim = spark.read.parquet(lk.path)
        if lk.select:
            dim = dim.select(*lk.keys, *lk.select)
        df = lookup_join(
            df,
            dim,
            lk.keys,
            default_values=lk.defaults,
            how="inner" if lk.required else "left",
            conditions=lk.conditions,
        )
    for qs in item.query_sources:
        df = apply_query_source(spark, df, qs, params)
    if item.transformer:
        df = TRANSFORMERS[item.transformer](df)
    return df


def project_for_dst(df: DataFrame, dst: DstConfig) -> DataFrame:
    if not dst.mappings:
        return df
    return df.select(*[m.expr() for m in dst.mappings])


def run_etl_item(
    spark: SparkSession,
    item: EtlItemConfig,
    epoch_id: int | None = None,
    fence_prefix: str | None = None,
    params: dict | None = None,
) -> dict:
    """Execute one item: src → N destinations in order; abort chain on
    failure (EtlLoadHelper.java:144-160). Returns per-dst applied metrics."""
    from .cdc.merge import merge_into
    from .lake.table import LakeTable

    src = build_item_frame(spark, item, params)
    out: dict = {}
    for i, dst in enumerate(item.dsts):
        frame = project_for_dst(src, dst)
        table = LakeTable(spark, dst.table_path)
        fence = f"{fence_prefix or item.name}:dst{i}"
        if dst.mode == "append":
            if epoch_id is not None and table.epoch_already_applied(fence, epoch_id):
                out[dst.table_path] = {"skipped_epoch": True}
                continue
            commit = table.append(frame, epoch={"fence_key": fence, "epoch_id": epoch_id})
            out[dst.table_path] = {"appended": True, "version": commit.version}
        else:
            # adapt to the change-feed contract the MERGE expects
            if dst.lsn_col != "lsn":
                frame = frame.withColumnRenamed(dst.lsn_col, "lsn")
            if dst.op_col != "op":
                frame = frame.withColumnRenamed(dst.op_col, "op")
            if dst.origin_col != "origin":
                frame = frame.withColumnRenamed(dst.origin_col, "origin")
            if "op" not in frame.columns:
                frame = frame.withColumn("op", F.lit("I"))
            if "lsn" not in frame.columns:
                frame = frame.withColumn("lsn", F.lit(epoch_id or 0).cast("long"))
            if "origin" not in frame.columns:
                frame = frame.withColumn("origin", F.lit(item.name))
            res = merge_into(
                table, frame, key=dst.key, fence_key=fence, epoch_id=epoch_id,
                policy=dst.policy,
            )
            out[dst.table_path] = res.applied
    return out
