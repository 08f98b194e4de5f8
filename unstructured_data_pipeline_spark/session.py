"""SparkSession factory with scale-oriented defaults.

The engine targets multi-executor clusters reading ~100 TB; locally we run
``local[N]``.  Every default here is chosen to survive a 1000x scale-up:

* AQE on (runtime coalescing, skew-join splitting, dynamic join selection).
* Arrow on (all our AI/document UDFs are pandas UDFs — Arrow batch transfer).
* ``shuffle.partitions`` sized for the local test harness; on a real cluster
  AQE's coalescing makes the static number mostly irrelevant.
* UTC session timezone so timestamp semantics are reproducible anywhere.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Driver-heap default: min(48g, ~40% of MemTotal), floor 2g.

    48g is right for the 128 GiB bench sandbox (local mode runs driver +
    all executor threads in ONE JVM and the 200-query marathon dies on the
    1g PySpark default), but a blanket 48g can fail JVM launch outright on
    smaller hosts or strict vm.overcommit (ADVICE r7) — so the default now
    scales with the machine.  ``SPARK_GRAFT_DRIVER_MEM`` still overrides,
    and a cluster submit's ``--driver-memory`` bypasses this entirely.
    """
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(2, min(48, (total_gib * 2) // 5))}g"
    except (OSError, ValueError, IndexError):
        pass
    return "4g"  # unknown platform: conservative, still > the 1g default


_MEM_LOGGED = False


def _log_driver_mem_once(mem: str, src: str) -> None:
    """One stderr line naming the chosen driver heap (ADVICE r8): on a
    platform without /proc/meminfo the fallback is a flat 4g, which can
    silently undersize the marathon workload — make the choice visible in
    bench/test output instead of discoverable only via Spark UI."""
    global _MEM_LOGGED
    if _MEM_LOGGED:
        return
    _MEM_LOGGED = True
    print(f"# spark.driver.memory={mem} ({src})", file=sys.stderr)


def get_spark(
    app_name: str = "unstructured-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster is configured — on a real deployment you simply submit
    with ``--master yarn``/``k8s`` and this function leaves it alone.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    defaults = {
        # Local mode runs driver + all executor threads in ONE JVM; PySpark's
        # default heap is ~1g, which is the prime suspect for the recurring
        # JVM deaths at the tail of the 200-query bench marathon (VERDICT r6
        # #2: r2/r5/r6 all died mid-EXTRA).  48g leaves plenty of the 128 GiB
        # sandbox for Python workers + page cache.  Takes effect only at JVM
        # launch (builder-time), which is exactly where this is applied; a
        # cluster submit with --driver-memory overrides it via extra_conf.
        "spark.driver.memory": _default_driver_mem(),
        # pin ANSI on: the driver's vanilla session runs Spark 4 ANSI-mode
        # defaults, so our sessions must match (element_at/cast/div-by-zero
        # all change behavior between modes)
        "spark.sql.ansi.enabled": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or 32),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # documents/embeddings rows can be wide (binary content, text,
        # float vectors); keep broadcasts conservative and let AQE decide.
        "spark.sql.autoBroadcastJoinThreshold": "64MB",
        "spark.sql.files.maxPartitionBytes": "128MB",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        defaults.update(extra_conf)
    src = (
        "caller extra_conf"
        if extra_conf and "spark.driver.memory" in extra_conf
        else "env SPARK_GRAFT_DRIVER_MEM"
        if os.environ.get("SPARK_GRAFT_DRIVER_MEM")
        else "host-scaled default"
    )
    for k, v in defaults.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ADVICE r9: spark.driver.memory only takes effect at JVM launch, so when
    # getOrCreate() attaches to an already-running session the requested value
    # may never have been applied.  Log the EFFECTIVE value read back from the
    # live session; flag a mismatch with the requested one explicitly.
    requested = defaults["spark.driver.memory"]
    try:
        effective = spark.conf.get("spark.driver.memory")
    except Exception:
        effective = requested
    if effective != requested:
        src = f"pre-existing JVM; {requested} requested via {src}"
    _log_driver_mem_once(effective, src)
    return spark
