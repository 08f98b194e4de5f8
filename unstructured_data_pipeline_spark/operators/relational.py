"""Relational operators beyond the reference's surface: as-of join,
gap-based sessionization, latest-per-key.

These extend the engine toward general event analytics (the `events` fixture
table) while staying pure DataFrame — single window shuffle each, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """One row per key: the first row under ``order_by`` (descending orders
    give you "latest").  W1 generalized."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for each left row, the single right row with the same key
    and the greatest right_ts <= left_ts (``backward``; ``forward`` =
    smallest right_ts >= left_ts).

    Implementation: union-and-window — tag both sides, sort within key by
    time, carry the last-seen right row forward with ``last(ignorenulls)``.
    The left payload rides along in the union (nulled on right-side rows),
    so every left row maps to exactly one output row: genuinely duplicate
    left rows each survive, and tied right rows at the same (key, ts) can
    never fan the output out.  Among tied right rows the one with the
    largest ``xxhash64`` of its payload wins — arbitrary but deterministic.
    One shuffle on the key, no range-explosion join; robust to skewed keys
    at 100 TB scale (a direct ``join + filter + row_number`` materializes
    |left_key| x |right_key| pairs; this never does).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    rcols = [c for c in right.columns if c not in (on, right_ts)]
    lcols = [c for c in left.columns if c != on]  # includes left_ts
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.xxhash64(*[F.col(c) for c in right.columns]).alias("_rtie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(c + suffix) for c in rcols],
        F.col(right_ts).alias(right_ts + suffix),
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_rtie"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in rcols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(right_ts + suffix),
    )
    both = l.unionByName(r)

    if direction == "backward":
        # right rows sort before left rows at equal ts (<=), then carry forward
        order = [F.col("_ts").asc(), F.col("_side").desc(), F.col("_rtie").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").desc(), F.col("_rtie").asc()]
    w = Window.partitionBy(on).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    carried = [
        F.last(F.col(c + suffix), ignorenulls=True).over(w).alias(c + suffix)
        for c in rcols + [right_ts]
    ]
    return (
        both.select(on, "_side", *lcols, *carried)
        .filter(F.col("_side") == 0)
        .drop("_side")
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    user's previous event exceeds ``gap_minutes``.  Classic lag + cumulative
    sum over one window shuffle."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col)).over(w).cast("long")
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
