"""Join operators mirroring the reference's join semantics (SURVEY.md §2.3).

The reference builds SQL strings and lets the source RDBMS execute them, plus
per-record point-lookup SELECTs. Here every join is a declarative DataFrame
join so Catalyst picks broadcast/SMJ/shuffled-hash and AQE fixes skew at
runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def anti_join(src: DataFrame, dst: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of src with no match in dst — the reference's final data
    verification NOT EXISTS re-scan
    (api:etl/model/EtlDatabaseObjectSearchParams.java:139-164;
    api:engine/Engine.java:135-162)."""
    return src.join(dst.select(*keys).distinct(), on=keys, how="left_anti")


def semi_join(src: DataFrame, dst: DataFrame, keys: list[str]) -> DataFrame:
    """EXISTS composition (api:etl/model/EtlDatabaseObjectSearchParams.java:166-190)."""
    return src.join(dst.select(*keys).distinct(), on=keys, how="left_semi")


def filter_join(
    main: DataFrame,
    aux: list[tuple[DataFrame, list[Column], str]],
) -> DataFrame:
    """The reference's ``selfJoinTables`` filter-join
    (api:etl/model/EtlDatabaseObjectSearchParams.java:44-91): aux tables are
    joined purely to add predicates; INNER branches must match, LEFT branches
    form an OR-of-matched disjunction (a row passes if *any* left branch
    matched).

    ``aux``: list of (table, join_conditions, "inner"|"left"). Each left aux
    table must expose a non-null marker column named ``__match``.
    Semantically a semi-join — expressed as joins + a coalesce filter so the
    OR-branch semantics survive.
    """
    out = main
    left_markers: list[Column] = []
    for i, (tbl, conds, how) in enumerate(aux):
        marker = f"__match_{i}"
        tagged = tbl.withColumn(marker, F.lit(True))
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        out = out.join(tagged, cond, how)
        if how == "left":
            left_markers.append(F.col(marker))
    if left_markers:
        disjunction = left_markers[0]
        for m in left_markers[1:]:
            disjunction = disjunction | m
        out = out.filter(F.coalesce(disjunction, F.lit(False)))
    return out.select(*[c for c in out.columns if not c.startswith("__match_")])


def lookup_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    default_values: dict | None = None,
    how: str = "left",
    conditions: dict | None = None,
) -> DataFrame:
    """Parent/dimension lookup: the reference resolves each FK with a
    per-record SELECT (api:model/pojo/generic/DatabaseObjectDAO.java:247-290,
    orchestrated by api:etl/model/LoadRecord.java:230-304). Re-expressed as a
    broadcast join against the dimension; absent parents get the configured
    defaults (``defaultValueDueInconsistency``) instead of a per-row repair
    loop.

    ``conditions`` is the reference's conditional-FK gate
    (``conditionalFields``, api:etl/model/LoadRecord.java:313-330, shipped
    config db_quick_merge_gaza.json): the parent is resolved only for rows
    whose condition fields match; non-matching rows pass through untouched
    (dim columns NULL, no defaults). Expressed by folding the condition into
    the join predicate, so it stays ONE broadcast join:

    - matching row, parent found   → dim columns attached
    - matching row, parent missing → defaults (or dropped when required)
    - non-matching row             → dim columns NULL, never dropped
    """
    if not conditions:
        joined = facts.join(F.broadcast(dim), on=keys, how=how)
        for col_name, default in (default_values or {}).items():
            joined = joined.withColumn(col_name, F.coalesce(F.col(col_name), F.lit(default)))
        return joined

    cond = F.lit(True)
    for k, v in conditions.items():
        cond = cond & (F.col(f"__f.{k}") == F.lit(v))
    f = facts.alias("__f")
    # mark parent presence before the join: a dim row always has __hit=true
    d = F.broadcast(dim.withColumn("__hit", F.lit(True))).alias("__d")
    on = cond
    for k in keys:
        on = on & (F.col(f"__f.{k}") == F.col(f"__d.{k}"))
    joined = f.join(d, on, "left")
    # required ⇒ drop only rows that MATCH the condition but found no parent.
    # A NULL condition field does NOT match (SQL three-valued logic would
    # make ~cond NULL and silently drop the row) — coalesce pins it to the
    # pass-through branch, honoring the "never dropped" contract above.
    if how == "inner":
        joined = joined.filter(~F.coalesce(cond, F.lit(False)) | F.col("__hit").isNotNull())
    out = joined.select(
        "__f.*", *[f"__d.{c}" for c in dim.columns if c not in keys], "__d.__hit"
    )
    cond_out = F.lit(True)
    for k, v in conditions.items():
        cond_out = cond_out & (F.col(k) == F.lit(v))
    for col_name, default in (default_values or {}).items():
        out = out.withColumn(
            col_name,
            F.when(cond_out & F.col("__hit").isNull(), F.lit(default)).otherwise(F.col(col_name)),
        )
    return out.drop("__hit")


def shared_pk_join(a: DataFrame, b: DataFrame, pk: list[str], how: str = "inner") -> DataFrame:
    """1:1 tables sharing a PK (patient⋈person), discovery
    api:conf/interfaces/TableConfiguration.java:1324-1347 — a plain equi-join
    on the PK."""
    return a.join(b, on=pk, how=how)
