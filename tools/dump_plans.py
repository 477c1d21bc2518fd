"""Regenerate PLANS.md: formatted physical plans for representative queries,
with the properties that matter at 100 TB called out (pushdown, pruning,
whole-stage codegen, broadcast vs shuffle, exchange count).

Run: PYTHONPATH=. python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmrs_module_epts_etl_spark.plans import QUERIES  # noqa: E402
from openmrs_module_epts_etl_spark.session import get_spark  # noqa: E402

SHOWCASE = {
    "q6_forecast_revenue": (
        "Filters + projection reach the parquet scan (PushedFilters/ReadSchema "
        "list only the 4 needed columns of 16); single partial+final agg, no join."
    ),
    "q5_local_supplier_volume": (
        "Dimension tables (region→nation→supplier/customer) broadcast; the fact "
        "table never shuffles for the dimension joins."
    ),
    "latest_event_per_user": (
        "CDC dedupe as narrow max(lsn) HashAggregate (partial_max before the "
        "exchange — a hot user contributes one ~24-byte row per map task to the "
        "shuffle, not every event) + left-semi join-back to re-attach the "
        "payload. No SortAggregate anywhere: the max_by(struct) formulation "
        "would sort the full payload on both sides of its exchange."
    ),
    "token_stats": (
        "Pure narrow projection: one WholeStageCodegen span over the scan, zero "
        "exchanges — token counting at 100 TB is scan-bound, as it should be."
    ),
    "pk_gap_detect": (
        "Gap detection without a global sort: window partitioned by key block "
        "(parallel) plus a tiny per-block aggregate window; no single-partition "
        "Window over the full table anywhere in the plan."
    ),
    "embedding_near_dup_pairs": (
        "Banded hyperplane-LSH: the self-join key is (band, bucket) — 24-byte "
        "rows through the candidate exchange, |bucket|²-bounded pair "
        "generation — then vectors re-attach to the (small) distinct "
        "candidate set for exact cosine verification. No label/metadata "
        "blocking: a skewed label cannot make this quadratic."
    ),
    "near_dup_jaccard_pairs": (
        "The composed dedup scale path: MinHash-LSH candidate pairs (banded "
        "bucket self-join) feed an exact shingle-overlap Jaccard restricted "
        "to candidates — the all-pairs shingle join of the standalone "
        "operator never appears in this plan."
    ),
    "conv_reassembly": (
        "Whole-conversation reassembly (the north-rule invariant as a query): "
        "ONE hash exchange keyed by conv_id with partial (map-side) "
        "ObjectHashAggregate; turn order is imposed by array_sort over the "
        "bounded per-conversation array — no global sort, no window, and "
        "per-key state is capped by max turns so there is no skew failure "
        "mode."
    ),
    "decontamination": (
        "Eval-set shingles are broadcast (benchmark ≪ corpus); the corpus "
        "side is scan → per-row shingle fan-out → BroadcastHashJoin "
        "LeftSemi → hash-distinct on doc_id. The corpus text never crosses "
        "an exchange — the only shuffled rows are the surviving ids."
    ),
    "doc_repetition": (
        "Gopher repetition filters: per-row pieces are higher-order JVM "
        "expressions in one codegen span; the bigram mode count is "
        "explode → two-level groupBy keyed (doc_id, gram), partial-aggregated "
        "map-side, so the exchange carries counts, never raw text. The "
        "split+bigram subtree feeding both branches is persisted "
        "(InMemoryTableScan below) — the most expensive per-row work runs "
        "once, not twice."
    ),
    "session_window_agg": (
        "Native session windows: one Exchange on the key, sessions merged "
        "inside the aggregate (no per-key global sort, no Python); the same "
        "operator runs on a watermarked stream with state expired by the "
        "watermark."
    ),
    "reconciliation_report": (
        "MISSING/PHANTOM/OUTDATED in ONE full-outer join on the keys: each "
        "side is scanned and shuffled exactly once; the three classes fall "
        "out of null-sidedness plus a null-safe field compare in the same "
        "projection. The composed form (two anti-joins + an inner join) "
        "reads each side three times — at 100 TB per side that is 6 scans "
        "vs 2."
    ),
    "cdc_snapshot_diff": (
        "Row-level changelog between two table versions, FUSED (round 5): "
        "the union of both versions' pruned file lists is scanned ONCE with "
        "per-side membership flags (files common to both commits are "
        "byte-identical — the earlier two-state form read them twice), both "
        "versions' winner stamps come from ONE narrow HashAggregate "
        "(max/max_by over long/boolean buffers; the string-valued tombstone "
        "origin lives in a deletes-only side aggregate so it cannot demote "
        "the main agg to SortAggregate — the two small SortAggregates in "
        "this plan are that O(deletes) side branch), classification runs on "
        "the changed-keys-only winner frame (broadcast-semi-restricted to "
        "the touched keys from the cached diff-files scan), and a single "
        "full-width join-back emits insert/delete/update pre+post images by "
        "one array/explode projection. The unchanged bulk of the table is "
        "still pruned driver-side by bucket partition values and per-file "
        "key stats before any I/O; no full-outer join remains."
    ),
    "orders_enriched_querysource": (
        "The reference's per-row correlated @param query planned as broadcast "
        "joins: both chained extraQueryDataSources broadcast their dimension; "
        "the orders scan carries the pushed o_totalprice filter and never "
        "shuffles."
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-dump", master="local[4]", shuffle_partitions=8)
    out = ["# PLANS — physical plans of representative queries",
           "",
           f"Generated by `tools/dump_plans.py` on `{sf_dir}` "
           "(plan shape is sf-independent; AQE final shapes shown where applicable).",
           ""]
    try:
        for name, note in SHOWCASE.items():
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue().rstrip()
            out += [f"## {name}", "", f"**Why this plan is right:** {note}", "",
                    "```", plan, "```", ""]
    finally:
        spark.stop()
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
