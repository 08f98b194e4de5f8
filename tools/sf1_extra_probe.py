#!/usr/bin/env python
"""sf0.1 -> sf1 scaling probe over the scale-critical EXTRA operators.

The headline's sf1 A/B (SCALE.md) proved the frozen suite sub-linear; this
probe extends the evidence to the training-data operators whose 100 TB
claims rest on bucketing/blocking/bounded-iteration arguments: run each at
sf0.1 AND at the synthetic sf1 (tools/make_sf1.py), same session config,
and print per-op (sf0.1 s, sf1 s, ratio).  A ratio well under 10x on 10x
rows is the measured form of the "bounded candidate set / map-side
combine / broadcast dim" design claims.

Usage: python tools/sf1_extra_probe.py [ops...]   (default: the list below)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from unstructured_data_pipeline_spark import get_spark
from unstructured_data_pipeline_spark.queries import REGISTRY

# scale-critical picks: dedup (prefix SSJoin, LSH, containment, semantic),
# retrieval (BM25, PQ-ADC, binary-Hamming), graph (triangles, k-core,
# PageRank), text/IR (inverted index, decontam), planner stats (join-size
# sampling, equi-depth), quality gates (FK audit)
DEFAULT_OPS = [
    "dedup_ngram_jaccard_prefix",
    "dedup_containment_pairs",
    "semdedup_report",
    "decontam_benchmark_overlap",
    "bm25_topk_contract",
    "ann_pq_topk_contract",
    "binary_quant_hamming_topk",
    "triangle_count_copurchase",
    "kcore_decomposition",
    "pagerank_part_copurchase",
    "inverted_index_report",
    "join_cardinality_estimate",
    "equidepth_histogram_orders",
    "referential_integrity_audit",
    "fuzzy_record_linkage",
    "gdpr_erasure_cascade",
]

SCALES = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/root/repo/.testdata-sf1")]

# opt-in third decade: SPARK_GRAFT_PROBE_SF10=1 appends the sf10 fixture
# (tools/make_sf1.py OUT=.testdata-sf10), extending the per-op growth
# series to 100x the bench scale
import os

if os.environ.get("SPARK_GRAFT_PROBE_SF10"):
    SCALES.append(("sf10", "/root/repo/.testdata-sf10"))


def main() -> None:
    ops = sys.argv[1:] or DEFAULT_OPS
    spark = get_spark(app_name="sf1-extra-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[str, float]] = {}
    for label, sf_dir in SCALES:
        for name in ops:
            fn, _ = REGISTRY[name]
            try:
                fn(spark, sf_dir).collect()  # warm/JIT this plan shape
                t0 = time.perf_counter()
                n = len(fn(spark, sf_dir).collect())
                dt = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001 — record and continue
                print(f"# {label} {name}: FAILED {e}", file=sys.stderr)
                continue
            results.setdefault(name, {})[label] = dt
            print(f"# {label} {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
            spark.catalog.clearCache()  # table-layer/PQ entries persist state
    rows = {
        name: {
            **r,
            "ratio": round(r["sf1"] / r["sf0.1"], 2)
            if "sf1" in r and r.get("sf0.1")
            else None,
            **(
                {"ratio_sf10": round(r["sf10"] / r["sf0.1"], 2)}
                if "sf10" in r and r.get("sf0.1")
                else {}
            ),
        }
        for name, r in results.items()
    }
    print(json.dumps({"probe": "sf1_extra", "ops": rows}))
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
