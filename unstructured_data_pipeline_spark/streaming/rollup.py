"""Continuous (hypertable-style) rollup: a time-bucketed aggregate table
maintained incrementally by a stream — the Structured Streaming answer to
TimescaleDB continuous aggregates / materialized rollups.

Each micro-batch contributes a PARTIAL aggregate (map-side combinable),
which is additively merged into the rollup table keyed by
(bucket, dimension).  Only ADDITIVE metrics participate (counts, sums —
the hypertable restriction); mergeable-distinct needs a sketch column
(see `queries.kmv_distinct_sketch` for the deterministic KMV shape).

Exactly-once: foreachBatch delivery is at-least-once, and an additive
merge double-counts on replay — so the table carries a batch-id
high-watermark (`_last_batch` beside the data) and `merge_rollup_batch`
skips batches at-or-below it.  Replays of the same epoch therefore no-op,
and the final table equals the one-shot batch aggregate regardless of how
arrivals were micro-batched (tested, and oracle-checked via
`queries.continuous_rollup_events`).

At scale: the per-batch partial agg shuffles only the batch's rows; the
merge joins the (small) partial against the rollup table on the bucket
key.  The table rewrite is O(rollup size) per batch via the versioned
snapshot layer — bounded because rollups are aggregates, not raw data;
a production deployment swaps in a merge-on-read table format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unstructured_data_pipeline_spark.operators.dml import ParquetTable


def _hwm_path(table: ParquetTable) -> str:
    return os.path.join(table.path, "_last_batch")


def last_applied_batch(table: ParquetTable) -> int:
    try:
        with open(_hwm_path(table)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return -1


def merge_rollup_batch(
    table: ParquetTable,
    partial: DataFrame,
    keys: list[str],
    metrics: list[str],
    batch_id: int,
) -> bool:
    """Additively merge one micro-batch's partial aggregate; returns False
    (no-op) for an already-applied ``batch_id`` (replay)."""
    if batch_id <= last_applied_batch(table):
        return False
    table.ensure()
    # suffix the metric columns per side; USING full-outer join coalesces
    # the key columns natively
    cur = table.read().select(
        *keys, *[F.col(m).alias(f"{m}_c") for m in metrics]
    )
    p = partial.select(*keys, *[F.col(m).alias(f"{m}_p") for m in metrics])
    merged = cur.join(p, keys, "full_outer").select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"{m}_c"), F.lit(0).cast("long"))
                + F.coalesce(F.col(f"{m}_p"), F.lit(0).cast("long"))
            ).alias(m)
            for m in metrics
        ],
    )
    table._replace(merged)
    tmp = _hwm_path(table) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, _hwm_path(table))  # atomic, like the CURRENT pointer
    return True
