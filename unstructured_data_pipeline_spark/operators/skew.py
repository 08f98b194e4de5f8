"""Skew mitigation for joins (SURVEY §4; the 100 TB problem AQE's skew-join
split solves automatically for sort-merge joins — this operator is the
explicit form for when AQE can't help: extreme single-key skew, broadcast-
ineligible small sides, or static plans).

``salted_join``: the big side's join key is salted with a random-free,
deterministic ``hash(row) % n`` component; the small side is replicated
``n`` times, once per salt value.  Each hot key's rows then spread over
``n`` shuffle partitions instead of one.  Semantics are exactly the plain
inner equi-join (each big row meets the one replicated copy matching its
salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on column ``on``, salting the big
    side into ``n_salts`` sub-keys.  ``how`` may be 'inner' or 'left'
    (semantics preserved for both — every big row carries exactly one
    salt, and every (key, salt) exists on the replicated side)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    # deterministic spread: hash of the whole row modulo n (xxhash64 is a
    # JVM-side, shuffle-stable function; no RNG -> retries/speculative
    # tasks produce identical salts)
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, on=[on, "_salt"], how=how)
    return out.drop("_salt")
