"""Context-window packing: greedy sequential packing of documents into
fixed token budgets — the step that turns a curated corpus into
training-sequence groups.

Packing is inherently sequential WITHIN a shard (each decision depends on
the running total) and embarrassingly parallel ACROSS shards — exactly
``applyInPandas``'s contract, the engine's pattern for custom stateful
per-group logic.  Shard granularity is the caller's choice: a production
packer shards to ~100-500 MB of text (e.g. lang x hash bucket) so every
group streams through one Arrow batch chain in O(n); nothing is ever
collected to the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = "shard string, id bigint, sz bigint, pack_id bigint"


def pack_greedy(
    df: DataFrame, shard_col: str, id_col: str, size_col: str, budget: int
) -> DataFrame:
    """Assign each row a ``pack_id`` within its shard.

    Rows are taken in ascending id order; a new pack starts when adding the
    next row would exceed ``budget``.  A single oversized row still
    occupies one pack of its own.  Deterministic given unique (shard, id).
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        pack_ids: list[int] = []
        cur, pid = 0, 0
        for s in pdf["sz"]:
            s = int(s)
            if cur > 0 and cur + s > budget:
                pid += 1
                cur = 0
            cur += s
            pack_ids.append(pid)
        pdf["pack_id"] = pack_ids
        return pdf[["shard", "id", "sz", "pack_id"]]

    norm = df.select(
        F.col(shard_col).cast("string").alias("shard"),
        F.col(id_col).cast("long").alias("id"),
        F.col(size_col).cast("long").alias("sz"),
    )
    return norm.groupBy("shard").applyInPandas(pack, PACKED_SCHEMA)
