"""Custom stateful streaming operators (`applyInPandasWithState`).

The reference's only state is the hand-rolled ``NEW_UPLOADS.processed`` flag;
a training-data pipeline needs real per-key running state (dedup-seen sets,
per-user counters, session accumulators).  These are the Spark-native
stateful shapes: Arrow-batched state functions whose state lives in the
checkpointed state store — restart-safe, exactly-once, partitioned by key
across the cluster.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) over an event stream: emits the updated
    cumulative row for every user seen in each micro-batch.  State is the
    two-number accumulator — constant per key, so state-store size is
    O(distinct users) regardless of stream length."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        RUNNING_TOTALS_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
