"""Referential-integrity repair with cascade (VERDICT r01 item 10):
null-due-inconsistency, default remap, unresolvable removal, child cascade,
and the inconsistence_info-style ledger."""

from __future__ import annotations

from openmrs_module_epts_etl_spark.operators.repair import (
    ParentRef,
    TableNode,
    repair_graph,
    repair_referential,
)


def test_repair_single_table(spark):
    parent = spark.createDataFrame([(1,), (2,), (99,)], "pid long")
    child = spark.createDataFrame(
        [
            (10, 1, 1),     # fine
            (11, 3, 1),     # missing parent on fk_a (set_null) → nulled
            (12, 2, 7),     # missing parent on fk_b (default=99) → remapped
            (13, 3, 7),     # missing on both → repaired on both
            (14, None, 1),  # NULL fk is consistent (no parent demanded)
        ],
        "id long, fk_a long, fk_b long",
    )
    refs = [
        ParentRef("pa", parent, "fk_a", "pid", set_null=True),
        ParentRef("pb", parent, "fk_b", "pid", default_value=99),
    ]
    res = repair_referential(child, refs, "id", "child")
    rows = {r["id"]: r for r in res.repaired.collect()}
    assert set(rows) == {10, 11, 12, 13, 14}
    assert rows[11]["fk_a"] is None
    assert rows[12]["fk_b"] == 99
    assert rows[13]["fk_a"] is None and rows[13]["fk_b"] == 99
    assert rows[14]["fk_a"] is None
    assert res.removed.count() == 0
    led = {(r["record_id"], r["parent_table"]): r for r in res.ledger.collect()}
    assert set(led) == {("11", "pa"), ("12", "pb"), ("13", "pa"), ("13", "pb")}
    assert led[("11", "pa")]["action"] == "set_null"
    assert led[("12", "pb")]["action"] == "default"
    assert led[("12", "pb")]["default_applied"] == "99"


def test_repair_removes_unresolvable(spark):
    parent = spark.createDataFrame([(1,)], "pid long")
    child = spark.createDataFrame(
        [(10, 1), (11, 5)], "id long, fk long"
    )
    res = repair_referential(
        child, [ParentRef("p", parent, "fk", "pid")], "id", "child"
    )
    assert {r["id"] for r in res.repaired.collect()} == {10}
    assert {r["id"] for r in res.removed.collect()} == {11}
    led = res.ledger.collect()
    assert len(led) == 1 and led[0]["action"] == "removed"


def test_repair_graph_cascade(spark):
    # grandparent → mid → leaf chain: removing an unresolvable mid row
    # orphans its leaf children, repaired/removed in the next round
    gp = spark.createDataFrame([(1,), (2,)], "id long")
    mid = spark.createDataFrame(
        [(10, 1), (11, 3), (12, 2)], "id long, gp_id long"  # 11 → orphan
    )
    leaf = spark.createDataFrame(
        [(100, 10), (101, 11), (102, 13)], "id long, mid_id long"
        # 101 orphaned by the cascade (mid 11 removed); 102 orphan from start
    )
    out = repair_graph(
        {
            "gp": TableNode("gp", gp, "id"),
            "mid": TableNode(
                "mid", mid, "id", parents=[("gp", "gp_id", None, False, None)]
            ),
            "leaf": TableNode(
                "leaf", leaf, "id", parents=[("mid", "mid_id", None, False, None)]
            ),
        }
    )
    assert {r["id"] for r in out["mid"].repaired.collect()} == {10, 12}
    assert {r["id"] for r in out["mid"].removed.collect()} == {11}
    assert {r["id"] for r in out["leaf"].repaired.collect()} == {100}
    assert {r["id"] for r in out["leaf"].removed.collect()} == {101, 102}
    led = {(r["record_id"], r["parent_table"]) for r in out["leaf"].ledger.collect()}
    assert led == {("101", "mid"), ("102", "mid")}


def test_repair_graph_cascade_with_set_null(spark):
    # a cascaded orphan with set_null survives with a NULLed FK instead of
    # being removed — the repair half of resolveChildrenInconsistences
    gp = spark.createDataFrame([(1,)], "id long")
    mid = spark.createDataFrame([(10, 1), (11, 9)], "id long, gp_id long")
    leaf = spark.createDataFrame([(100, 11)], "id long, mid_id long")
    out = repair_graph(
        {
            "gp": TableNode("gp", gp, "id"),
            "mid": TableNode("mid", mid, "id", parents=[("gp", "gp_id", None, False, None)]),
            "leaf": TableNode("leaf", leaf, "id", parents=[("mid", "mid_id", None, True, None)]),
        }
    )
    rows = out["leaf"].repaired.collect()
    assert len(rows) == 1 and rows[0]["mid_id"] is None
    assert out["leaf"].removed is None or out["leaf"].removed.count() == 0
