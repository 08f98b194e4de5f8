"""Generate PLANS.md: a physical-plan inventory of every registry query.

For each entry the executed plan is summarized into the counts a scale
review needs at a glance: parquet scans, shuffle Exchanges, join
strategies, and whole-stage-codegen coverage.  Lifecycle reports that
materialize through the warehouse table layer and return a literal frame
show as LocalTableScan (their heavy plans ran inside the function); the
per-operator plan claims for those live in their docstrings and unit
tests instead.

Usage: python tools/plan_inventory.py [sf_dir]  (default sf0.001 — plan
shape, not data volume, is what's inventoried; shapes are identical at
any SF because nothing in the repo branches on input size except AQE's
runtime choices, which the broadcast column reflects).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from unstructured_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from unstructured_data_pipeline_spark.session import get_spark  # noqa: E402


def summarize(plan: str) -> dict[str, int]:
    # AQE's final-plan toString appends the pre-adaptive tree under an
    # "== Initial Plan ==" header — count only the plan that ran
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "scans": len(re.findall(r"FileScan parquet", plan)),
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        # codegen spans are the distinct `*(n)` stage ids in the plan text
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "inmem": len(re.findall(r"InMemoryTableScan", plan)),
        "local": len(re.findall(r"LocalTableScan|Scan ExistingRDD", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    rows = []
    for name, (fn, _) in sorted(REGISTRY.items()):
        try:
            df = fn(spark, sf_dir)
            # execute first: AQE finalizes join strategies and codegen
            # stages only at runtime — the inventory reports the plan that
            # actually ran, not the pre-adaptive guess
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append((name, summarize(plan)))
        except Exception as exc:  # noqa: BLE001
            print(f"# ERROR {name}: {exc!r}"[:200], file=sys.stderr)
    out = Path(__file__).resolve().parents[1] / "PLANS.md"
    with open(out, "w") as f:
        f.write(
            "# PLANS — physical-plan inventory (auto-generated)\n\n"
            "`python tools/plan_inventory.py` regenerates this from the live\n"
            "registry.  Columns: parquet scans / shuffle Exchanges /\n"
            "broadcast Exchanges / broadcast-hash joins / sort-merge joins /\n"
            "broadcast-nested-loop joins (allowlisted bounded builds only —\n"
            "enforced by `tests/test_scale_features.py::test_no_unbounded_join_plans`) /\n"
            "WholeStageCodegen spans.  `local`>0 with scans=0 marks lifecycle\n"
            "reports returning a literal frame (their plans ran inside the\n"
            "function against scratch warehouse tables).\n\n"
            "| query | scans | exch | bcast | BHJ | SMJ | BNLJ | codegen | inmem | local |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n"
        )
        for name, s in rows:
            f.write(
                f"| {name} | {s['scans']} | {s['exchanges']} | {s['broadcasts']} "
                f"| {s['bhj']} | {s['smj']} | {s['bnlj']} | {s['codegen']} "
                f"| {s['inmem']} | {s['local']} |\n"
            )
    print(f"wrote {out} ({len(rows)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
