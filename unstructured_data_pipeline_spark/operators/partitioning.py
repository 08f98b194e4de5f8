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

# measuring a plan's partition count (df.rdd.getNumPartitions) forces an
# extra physical-planning pass; split counts are a function of the input
# files (size-based, unaffected by projection/filter pushdown), so the probe
# result is cached per file-set (VERDICT r1 minor #4)
_SPLIT_CACHE: dict[tuple[str, ...], int] = {}
_SPLIT_CACHE_MAX = 256

# set to "false" to make every call a guaranteed no-op (real deployments
# whose inputs always arrive well-split can skip even the probe)
ENSURE_MIN_PARALLELISM_CONF = "spark.unstructured_data_pipeline.ensureMinParallelism"


def ensure_min_parallelism(
    df: DataFrame, target: int | None = None, threshold: int | None = None
) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: the cluster's
    ``defaultParallelism``) iff its physical plan currently yields fewer
    than ``threshold`` (default: ``target``) partitions.  A no-op — zero
    added shuffle — when the input is already spread, so it is safe to
    leave in 100 TB paths."""
    spark = df.sparkSession
    if str(spark.conf.get(ENSURE_MIN_PARALLELISM_CONF, "true")).lower() != "true":
        return df
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if threshold is None:
        threshold = target
    # key on files + the ANALYZED plan's semantic hash (already computed for
    # the schema, so cheap): same scan -> cache hit; a plan with different
    # shape over the same files (e.g. post-shuffle) keys separately
    try:
        sem = df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        sem = None
    files = (tuple(df.inputFiles()), sem)
    if files[0] and sem is not None and files in _SPLIT_CACHE:
        n = _SPLIT_CACHE[files]
    else:
        n = df.rdd.getNumPartitions()
        if files[0] and sem is not None and len(_SPLIT_CACHE) < _SPLIT_CACHE_MAX:
            _SPLIT_CACHE[files] = n
    if n < threshold:
        return df.repartition(target)
    return df


def morton_key(x, y, bits: int = 8):
    """Z-order (Morton) interleave of two non-negative integer columns —
    the multi-dimensional clustering key for data-skipping layouts: writing
    a table sorted by ``morton_key(a, b)`` gives parquet row groups tight
    min/max ranges on BOTH ``a`` and ``b``, so selective filters on either
    column prune files (the Delta/Iceberg OPTIMIZE ZORDER idea, as a plain
    sort key).

    Built from div/mod integer arithmetic only (no engine-specific bit
    ops), so the key is bit-identical across engines and SQL-mirrorable:
    ``z = sum_j bit_j(x)*4^j + bit_j(y)*2*4^j`` — caller clamps inputs to
    ``2^bits``.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for j in range(bits):
        p = 2**j
        z = (
            z
            + (x.cast("long") / F.lit(p)).cast("long") % 2 * F.lit(4**j)
            + (y.cast("long") / F.lit(p)).cast("long") % 2 * F.lit(2 * 4**j)
        )
    return z
