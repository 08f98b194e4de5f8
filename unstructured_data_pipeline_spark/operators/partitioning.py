"""Input-parallelism guard for compute-heavy narrow stages.

Spark parallelizes a parquet scan by file *splits*, and a split never cuts
a row group.  An input written as few large row groups therefore scans as
few partitions — and every NARROW operator downstream (per-row hashing,
shingling, HOF lambdas, pandas UDFs) inherits that parallelism, no matter
how many cores the cluster has.  On a real deployment the input arrives in
many files/row groups and this is a non-issue; on single-row-group inputs
(e.g. the test fixtures) it silently serializes all per-row compute onto
one core.

``ensure_min_parallelism`` makes that explicit: if the plan would run with
fewer partitions than the cluster's default parallelism, round-robin
repartition before the expensive stage; otherwise leave the plan untouched
(NO shuffle added at scale).  The data moved by the repartition is exactly
the work set being balanced — for a CPU-bound stage that trade is right
whenever per-row compute dominates one extra row write+read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: the cluster's
    ``defaultParallelism``) iff its physical plan currently yields fewer
    partitions.  A no-op — zero added shuffle — when the input is already
    spread, so it is safe to leave in 100 TB paths."""
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
