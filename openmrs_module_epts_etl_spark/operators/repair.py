"""Referential-integrity repair with child cascade.

The reference repairs each record's missing parents one row at a time
(api:model/pojo/generic/AbstractDatabaseObject.java:456-574): per missing
parent ref, (1) null the FK when ``setNullDueInconsistency``, (2) remap to
``defaultValueDueInconsistency`` when that default parent exists, else
(3) remove the record and recursively repair its children
(``resolveChildrenInconsistences``), logging every decision to the
``inconsistence_info`` ledger. The whole loop is driven by per-record
SELECTs and saves (api:inconsistenceresolver/processor/
InconsistenceSolverProcessor.java:26-47).

Spark-first: the per-row loop becomes set operations —

- orphan detection per parent ref is ONE left join of the child frame
  against the parent's distinct keys (broadcast when the parent is a dim);
- null/default remapping is a column expression over the flagged rows;
- removal is a filter; the ledger is a union of per-ref projections;
- the child cascade is a fixpoint loop over the FK graph: each iteration
  anti-joins every table against its parents' surviving keys — iterations
  are bounded by the FK-graph depth, not the data size, and each is fully
  distributed (no driver-side row handling anywhere).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


@dataclass
class ParentRef:
    """One FK edge child→parent (ParentTable + RefMapping analog)."""

    parent_name: str                 # for the ledger
    parent_keys: DataFrame           # frame containing the parent key column
    child_fk: str                    # FK column on the child frame
    parent_key: str                  # key column on the parent frame
    set_null: bool = False           # setNullDueInconsistency
    default_value: object = None     # defaultValueDueInconsistency


class RepairResult(NamedTuple):
    repaired: DataFrame   # surviving rows, FKs possibly nulled/remapped
    removed: DataFrame    # rows dropped (unresolvable missing parent)
    ledger: DataFrame     # inconsistence_info analog, one row per (row, ref)


LEDGER_COLS = ["record_id", "table_name", "parent_table", "missing_value",
               "default_applied", "action"]


def repair_referential(
    df: DataFrame, refs: list[ParentRef], id_col: str, table_name: str = ""
) -> RepairResult:
    """Repair one table's missing parents. NULL FKs are consistent by
    definition (no parent demanded), matching the reference's
    loadMissingParents which only reports non-null dangling FKs."""
    flagged = df
    miss_cols = []
    for i, ref in enumerate(refs):
        m = f"__miss_{i}"
        miss_cols.append(m)
        keys = ref.parent_keys.select(
            F.col(ref.parent_key).alias(f"__pk_{i}"), F.lit(True).alias(f"__ok_{i}")
        ).distinct()
        flagged = (
            flagged.join(
                F.broadcast(keys), flagged[ref.child_fk] == keys[f"__pk_{i}"], "left"
            )
            .withColumn(m, F.col(ref.child_fk).isNotNull() & F.col(f"__ok_{i}").isNull())
            .drop(f"__pk_{i}", f"__ok_{i}")
        )

    # Per-ref resolvability is static config; default existence is one tiny
    # lookup against the parent keys (a dim-sized action, not a data scan).
    resolvable = []
    for ref in refs:
        if ref.set_null:
            resolvable.append(True)
        elif ref.default_value is not None:
            resolvable.append(
                ref.parent_keys.filter(
                    F.col(ref.parent_key) == F.lit(ref.default_value)
                ).limit(1).count() > 0
            )
        else:
            resolvable.append(False)

    unresolved = F.lit(False)
    for i, ok in enumerate(resolvable):
        if not ok:
            unresolved = unresolved | F.col(miss_cols[i])

    ledgers = []
    for i, (ref, ok) in enumerate(zip(refs, resolvable)):
        action = (
            "set_null" if ref.set_null
            else ("default" if ok else "removed")
        )
        ledgers.append(
            flagged.filter(F.col(miss_cols[i])).select(
                F.col(id_col).cast("string").alias("record_id"),
                F.lit(table_name).alias("table_name"),
                F.lit(ref.parent_name).alias("parent_table"),
                F.col(ref.child_fk).cast("string").alias("missing_value"),
                F.lit(
                    None if ref.set_null or not ok else str(ref.default_value)
                ).cast(StringType()).alias("default_applied"),
                F.lit(action).alias("action"),
            )
        )
    ledger = ledgers[0] if ledgers else None
    for extra in (ledgers or [])[1:]:
        ledger = ledger.unionByName(extra)

    removed = flagged.filter(unresolved).select(*df.columns)
    kept = flagged.filter(~unresolved)
    for i, (ref, ok) in enumerate(zip(refs, resolvable)):
        if ref.set_null:
            kept = kept.withColumn(
                ref.child_fk,
                F.when(F.col(miss_cols[i]), F.lit(None)).otherwise(F.col(ref.child_fk)),
            )
        elif ok:
            kept = kept.withColumn(
                ref.child_fk,
                F.when(F.col(miss_cols[i]), F.lit(ref.default_value)).otherwise(
                    F.col(ref.child_fk)
                ),
            )
    return RepairResult(kept.select(*df.columns), removed, ledger)


@dataclass
class TableNode:
    """One table in the FK graph for the cascading fixpoint repair."""

    name: str
    df: DataFrame
    id_col: str
    # (parent_table_name, child_fk, parent_key, set_null, default_value)
    parents: list[tuple] = field(default_factory=list)


def repair_graph(tables: dict[str, TableNode], max_rounds: int = 10) -> dict:
    """Cascading repair over an FK graph (resolveChildrenInconsistences
    analog): removing an unresolvable row orphans its children, which the
    next round repairs or removes in turn. Iterates to fixpoint — bounded by
    the FK-graph depth. Returns {name: RepairResult} with each table's final
    surviving frame, cumulative removals, and cumulative ledger.

    Frames are localCheckpointed per round so the lineage doesn't grow a
    join-tree per iteration (at scale, write intermediate rounds to the lake
    instead)."""
    current = {n: t.df for n, t in tables.items()}
    removed_acc: dict[str, DataFrame] = {}
    ledger_acc: dict[str, DataFrame] = {}
    for _ in range(max_rounds):
        changed = False
        for name, node in tables.items():
            refs = [
                ParentRef(p_name, current[p_name].select(tables[p_name].id_col),
                          child_fk, tables[p_name].id_col if parent_key is None else parent_key,
                          set_null, default)
                for (p_name, child_fk, parent_key, set_null, default) in node.parents
            ]
            if not refs:
                continue
            res = repair_referential(current[name], refs, node.id_col, name)
            n_removed = res.removed.count()
            n_ledger = res.ledger.count() if res.ledger is not None else 0
            if n_removed or n_ledger:
                changed = True
                current[name] = res.repaired.localCheckpoint(eager=True)
                if n_removed:
                    removed_acc[name] = (
                        res.removed if name not in removed_acc
                        else removed_acc[name].unionByName(res.removed)
                    ).localCheckpoint(eager=True)
                if res.ledger is not None and n_ledger:
                    ledger_acc[name] = (
                        res.ledger if name not in ledger_acc
                        else ledger_acc[name].unionByName(res.ledger)
                    ).localCheckpoint(eager=True)
        if not changed:
            break
    return {
        name: RepairResult(
            current[name], removed_acc.get(name), ledger_acc.get(name)
        )
        for name in tables
    }
