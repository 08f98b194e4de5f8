#!/usr/bin/env python
"""Same-day A/B probe of the PQ registry entries across two checkouts
(VERDICT r5 next #6): `ann_pq_topk_contract` measured 2.8x its r4 wall in
the judge's round-5 run — inside the unchanged-query host-drift band, but
it IS code round 5 rewrote (single-scan ADC).  This probe times the three
PQ registry entries on whatever checkout's package directory is first on
sys.path, so running it once from the current repo and once from a
round-4 worktree gives the code-vs-host answer.

Usage: python tools/pq_ab_probe.py <repo_root> [sf_dir]
Prints one JSON line {"repo": ..., "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

ENTRIES = ["ann_pq_topk_contract", "ann_pq_subspace_topk", "ann_pq_recall"]


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sys.path.insert(0, repo)
    from unstructured_data_pipeline_spark import get_spark
    from unstructured_data_pipeline_spark.queries import REGISTRY

    spark = get_spark(app_name="pq-ab-probe", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from unstructured_data_pipeline_spark.dist import ensure_shipped

    ensure_shipped(spark)
    out: dict[str, float] = {}
    for name in ENTRIES:
        fn = REGISTRY[name][0]
        fn(spark, sf_dir).collect()  # warm/JIT, same as bench.py methodology
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        out[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"repo": repo, "queries": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
