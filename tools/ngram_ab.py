"""dedup_ngram_jaccard headline-creep A/B (VERDICT r11 Next #3).

The judge flagged a 2.03 s (r1) -> 2.52 s (r10) -> 2.91 s (r11) drift.
The fuller tracked history is NOT monotonic: 2.03 (r1), 2.87 (r7),
2.93 (r8), 3.03 (r9), 2.52 (r10), 2.91 (r11).  The one code change is
commit f17867d ("promote prefix SSJoin", between the r6 and r7 benches):
the headline switched from the exhaustive inverted-index variant
(fixture-fast, quadratic in posting-list length at corpus scale) to the
prefix-filtered SSJoin (the 100 TB-safe default).  r7-r11 then oscillate
in a ~2.5-3.0 s session band around an unchanged implementation.

This probe turns both claims into same-session numbers on CURRENT code:

* A = the headline path (``prefix_filter=True``), B = the exhaustive
  variant (``prefix_filter=False``) — same corpus, same planted dups,
  pair-identical outputs (pinned by tests/test_units.py).
* runs are INTERLEAVED A,B,A,B,... in one Spark session after a shared
  warm-up scan, so box drift hits both arms equally;
* per-arm medians + raw lists are printed, plus the A-arm spread as the
  same-code noise band.

Usage: ``python tools/ngram_ab.py [n_rounds] [sf_dir]`` (default 5,
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1); prints one JSON line —
paste into SCALE.md.  Check ``uptime`` before/after: an external
contention slice (load-15m > ~5 with no repo processes) invalidates the
probe (SCALE.md round-11 discard protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from unstructured_data_pipeline_spark.operators import dedup as DD
from unstructured_data_pipeline_spark.queries._common import _t
from unstructured_data_pipeline_spark.session import get_spark


def corpus_df(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    near = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 2, 1000000), " "
        ).alias("text"),
    )
    return d.unionByName(near)


def run_variant(spark, sf_dir, prefix: bool) -> tuple[float, int]:
    t0 = time.monotonic()
    n = (
        DD.ngram_jaccard_pairs(
            corpus_df(spark, sf_dir),
            "doc_id",
            "text",
            n=3,
            threshold=0.5,
            prefix_filter=prefix,
        )
        .collect()
    )
    dt = time.monotonic() - t0
    return dt, len(n)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark()
    # shared warm-up: input scan + one throwaway run of each arm
    corpus_df(spark, sf_dir).count()
    run_variant(spark, sf_dir, True)
    run_variant(spark, sf_dir, False)
    a, b, pairs = [], [], set()
    for _ in range(rounds):
        dt, n = run_variant(spark, sf_dir, True)
        a.append(round(dt, 3))
        pairs.add(("A", n))
        dt, n = run_variant(spark, sf_dir, False)
        b.append(round(dt, 3))
        pairs.add(("B", n))
    def med(xs):
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)
    out = {
        "probe": "ngram_jaccard_prefix_vs_exhaustive",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "prefix_runs": a,
        "exhaustive_runs": b,
        "prefix_median": med(a),
        "exhaustive_median": med(b),
        "prefix_band": [min(a), max(a)],
        "n_pairs": sorted({n for _, n in pairs}),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
