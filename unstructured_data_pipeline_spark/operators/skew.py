"""Skew mitigation for joins (SURVEY §4; the 100 TB problem AQE's skew-join
split solves automatically for sort-merge joins — this module is the
explicit form for when AQE can't help: extreme single-key skew, broadcast-
ineligible small sides, or static plans).

A shuffle hash / sort-merge join routes ALL rows of one join key to one
reducer task.  Under a power-law key distribution (a celebrity user, a
default/placeholder id, one giant document cluster) that single task becomes
the straggler that dominates the stage — the canonical 100 TB join failure
mode.  Salting splits each key's fact rows across ``n_salts`` sub-keys and
replicates the (smaller) dim side once per salt, so the hot key's work
spreads over ``n_salts`` tasks while the pair set stays EXACTLY the plain
join's (each fact row meets the one replicated dim copy matching its salt).

Cost model: the dim side is replicated ``n_salts`` times by a row-local
``explode`` (no join, no broadcast-nested-loop) — pick
``n_salts ~ ceil(hot_key_rows / target_rows_per_task)`` and keep the dim
the smaller relation.  If the dim fits in memory, prefer ``broadcast()``
(no shuffle at all, skew-immune); salting is for the mid-size dim that is
too big to broadcast but much smaller than the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["key_skew_metrics", "salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``on``, salting the big side
    into ``n_salts`` sub-keys.  Result rows/columns identical to
    ``big.join(small, on, how)``; only the physical key distribution
    changes.  ``how`` may be 'inner' or 'left' (the shapes where the big
    side drives the output — every big row carries exactly one salt, and
    every (key, salt) exists on the replicated side; a right/full join
    would need the small side de-replicated)."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in big.columns or k not in small.columns:
            raise ValueError(f"join key {k!r} missing from a side")
    # deterministic spread: hash of the whole row modulo n (xxhash64 is a
    # JVM-side, shuffle-stable function; no RNG -> retries/speculative
    # tasks produce identical salts, and exact-duplicate rows sharing a
    # salt is harmless for correctness)
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, on=[*keys, "_salt"], how=how)
    return out.drop("_salt")


def key_skew_metrics(df: DataFrame, key: str | list[str]) -> DataFrame:
    """One-row skew diagnosis for a prospective join/groupBy key: row count,
    distinct keys, the hottest key's row count, and the max/mean ratio —
    the number that tells you whether to salt (ratio >> 1) and how many
    salts (``ceil(max_key_rows / target_rows_per_task)``).  Two
    aggregations, both map-side combinable — metadata cost at any scale."""
    keys = [key] if isinstance(key, str) else list(key)
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_key_rows"),
        (F.max("n") / (F.sum("n") / F.count(F.lit(1)))).alias("skew_ratio"),
    )
