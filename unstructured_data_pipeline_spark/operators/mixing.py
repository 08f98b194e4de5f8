"""Training-mixture allocation: UniMax epoch-capped water-filling.

Multilingual / multi-domain corpora are wildly skewed; sampling
proportionally overtrains the head and temperature sampling overfits the
tail by repeating it too often.  UniMax (Chung et al. 2023,
arXiv:2304.09151) allocates a token budget as UNIFORMLY as possible
across groups subject to a per-group epoch cap: no group contributes more
than ``epoch_cap`` passes over its own data, and the leftover budget
spreads evenly over the groups that can still absorb it.  That is exactly
water-filling, and it has a closed form — no iterative loop:

    sort groups by cap = epoch_cap * count ascending;
    group i is SATURATED (gets its full cap) iff even handing every
    not-yet-processed group cap_i would still fit the budget:
        prefix_{i-1} + cap_i * (n - i + 1) <= B        (pure integers!)
    every unsaturated group gets the water level
        t = (B - sum of saturated caps) / (n - #saturated).

The saturation predicate is integer arithmetic end to end, so the
partition of groups is bit-identical on any engine; the single division
producing the water level is the only float.

Scale shape: the input is one row per GROUP (languages, domains) — the
corpus-sized work is the upstream token count, one map-side-combinable
groupBy.  The window functions here run over that tiny per-group relation
(hundreds of rows at most), so the unpartitioned window is deliberate and
bounded, not a corpus sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["unimax_allocations"]


def unimax_allocations(
    counts: DataFrame,
    key_col: str,
    count_col: str,
    budget: int | None = None,
    epoch_cap: int = 2,
) -> DataFrame:
    """Closed-form UniMax allocation over a per-group count relation.

    ``counts`` has one row per group: ``(key_col, count_col)`` with
    integer counts.  ``budget`` is the total token budget; ``None`` means
    "one corpus epoch" (the sum of all counts — computed in-plan, so the
    result stays a pure function of the input).  Returns per group::

        (key, n_tokens, cap, saturated, alloc_r, epochs_r)

    where ``cap = epoch_cap * n_tokens``, ``saturated`` marks groups
    allocated their full cap, ``alloc_r`` is the (rounded) token
    allocation and ``epochs_r = alloc / n_tokens`` the resulting pass
    count — the number a sampling weight table is built from.
    """
    c = counts.select(
        F.col(key_col).alias("key"),
        F.col(count_col).cast("long").alias("n_tokens"),
    ).withColumn("cap", F.lit(int(epoch_cap)) * F.col("n_tokens"))
    everything = Window.partitionBy()
    by_cap = Window.orderBy("cap", "key")
    b_expr = (
        F.lit(int(budget)).cast("long")
        if budget is not None
        else F.sum("n_tokens").over(everything)
    )
    c = (
        c.withColumn("_b", b_expr)
        .withColumn("_n", F.count(F.lit(1)).over(everything))
        .withColumn("_i", F.row_number().over(by_cap))
        .withColumn(
            "_prefix",
            F.sum("cap").over(
                by_cap.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    saturated = (
        F.col("_prefix")
        - F.col("cap")
        + F.col("cap") * (F.col("_n") - F.col("_i") + 1)
    ) <= F.col("_b")
    c = c.withColumn("saturated", saturated)
    c = c.withColumn(
        "_sat_total",
        F.sum(F.when(F.col("saturated"), F.col("cap")).otherwise(F.lit(0))).over(
            everything
        ),
    ).withColumn(
        "_n_sat",
        F.sum(F.col("saturated").cast("long")).over(everything),
    )
    level = (F.col("_b") - F.col("_sat_total")).cast("double") / (
        F.col("_n") - F.col("_n_sat")
    ).cast("double")
    alloc = F.when(F.col("saturated"), F.col("cap").cast("double")).otherwise(level)
    return c.select(
        "key",
        "n_tokens",
        "cap",
        "saturated",
        F.round(alloc, 6).alias("alloc_r"),
        F.round(alloc / F.col("n_tokens").cast("double"), 6).alias("epochs_r"),
    ).orderBy("key")
