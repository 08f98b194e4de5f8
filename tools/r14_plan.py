"""Capture `.explain("formatted")` for named registry queries into
plans/r14/<name>_<tag>.txt (the round-14 before/after plan evidence).

Usage: python tools/r14_plan.py <tag> <query> [<query> ...] [--sf SF_DIR]
       [--out DIR]

Run from THIS checkout for "after" captures; run the copy inside the
pre-round git worktree for "before" captures (pass --out back to the main
checkout's plans/r14).  Lifecycle queries that return a literal frame show
their heavy plans only inside the function — for those the evidence is the
diff + job counts, not these files (same caveat as plans/r13).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from unstructured_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from unstructured_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    out_dir = str(Path(__file__).resolve().parents[1] / "plans" / "r14")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_dir = args[i + 1]
        del args[i : i + 2]
    tag, names = args[0], args[1:]
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn, _ = REGISTRY[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        p = Path(out_dir) / f"{name}_{tag}.txt"
        p.write_text(plan)
        print(f"# wrote {p} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
