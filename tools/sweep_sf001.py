"""Driver-mimic correctness sweep: run every oracle-backed registry query on
Spark AND DuckDB at an arbitrary SF dir (default sf0.01 — the driver's gate
scale) and report mismatches.  Dev tool, not part of the test suite (the
pytest gate runs the same harness at sf0.001)."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.oracle_harness import compare, run_oracle  # noqa: E402

from unstructured_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from unstructured_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    results: dict[str, dict] = {}
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            if sql is None:
                n = sdf.count()
                results[name] = {"rows_only": n, "problems": []}
            else:
                problems = compare(sdf, run_oracle(sql, sf_dir))
                results[name] = {"problems": problems}
        except Exception as exc:  # noqa: BLE001
            results[name] = {"problems": [f"EXCEPTION: {exc!r}"[:500]]}
        dt = time.perf_counter() - t0
        status = "ok" if not results[name]["problems"] else "FAIL"
        print(f"# {status} {name} {dt:.2f}s", file=sys.stderr, flush=True)
    bad = {k: v for k, v in results.items() if v["problems"]}
    # stdout carries exactly one JSON line; failure details go to stderr so
    # automation can parse stdout and trust the exit code
    print(json.dumps({"total": len(results), "failed": list(bad)}))
    for k, v in bad.items():
        print(f"## {k}", file=sys.stderr)
        for p in v["problems"]:
            print(f"   {p}", file=sys.stderr)
    spark.stop()
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
