#!/usr/bin/env python
"""sf10 pandas-UDF warm-drift attribution probe (VERDICT r12 next-round #3).

Two consecutive rounds' sf10-warm runs showed pandas-UDF ops (simhash,
minhash) 1.3-2.3x slower WARM than cold while JVM-scan ops sped up
normally.  Candidate causes: (a) external host-contention slices (the
documented signature), (b) a real Arrow-batch / page-cache interaction
(full page cache + Arrow IPC buffers competing for memory bandwidth).

Discriminating experiment: run the drifted pandas-UDF ops plus a JVM-scan
control at sf10, cold (caches dropped) then warm (second consecutive
process), at THREE Arrow batch sizes (half / default / double).  If the
drift is host noise it appears (or not) independent of batch size and
correlates with load-average spikes; if it is an Arrow interaction the
warm/cold ratio of the pandas ops moves with batch size while the JVM
control stays flat.

One invocation = one measurement process (fresh JVM, like the SCALE.md
protocol's runs): prints a single JSON line with per-op seconds and the
host load averages before/after.  The cold/warm pairing and cache drops
are driven from the shell so each run is a clean process:

    for B in 5000 10000 20000; do
      sync; echo 3 > /proc/sys/vm/drop_caches
      python tools/arrow_warm_probe.py $B cold
      python tools/arrow_warm_probe.py $B warm
    done
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from unstructured_data_pipeline_spark import get_spark
from unstructured_data_pipeline_spark.queries import REGISTRY

SF10 = "/root/repo/.testdata-sf10"

# the two ops that drifted in r11/r12 sf10-warm runs + a JVM-scan control
OPS = ["dedup_simhash", "dedup_minhash_lsh", "q1_pricing_summary"]


def loadavg() -> list[float]:
    with open("/proc/loadavg") as fh:
        return [float(x) for x in fh.read().split()[:3]]


def main() -> None:
    batch = sys.argv[1] if len(sys.argv) > 1 else "10000"
    label = sys.argv[2] if len(sys.argv) > 2 else "?"
    spark = get_spark(
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": batch}
    )
    before = loadavg()
    times = {}
    for op in OPS:
        fn, _ = REGISTRY[op]
        t0 = time.perf_counter()
        fn(spark, SF10).count()
        times[op] = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "batch": int(batch),
                "state": label,
                "times": times,
                "load_before": before,
                "load_after": loadavg(),
            }
        )
    )


if __name__ == "__main__":
    main()
