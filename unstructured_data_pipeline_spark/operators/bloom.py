"""Distributed Bloom-filter join pruning (SURVEY §4 scale toolkit).

The 100 TB problem: a selective filter on a *small* relation should shrink
the scan/shuffle of the *large* relation it joins — but a plain semi join
still shuffles every large-side row to find out it has no partner.  Spark's
own runtime row-level filtering (``spark.sql.optimizer.runtime.bloomFilter``)
covers many shapes automatically; this operator is the explicit, composable
form — useful when the build side is an arbitrary DataFrame (not a join
child Catalyst can see through), when the pruned column feeds several
downstream joins, or when the filter should be persisted and reused across
jobs.

Design (all JVM-side Column expressions, no Python UDFs):

- **Build** (one aggregation over the small side): each key row computes its
  ``k`` bit positions with ``xxhash64(key, seed_i) mod m``; positions fold
  into per-row ``(word_index, or_mask)`` pairs, which a ``bit_or`` groupBy
  merges into the filter's 64-bit words.  The finished filter is
  ``m / 64`` longs — a few KiB — collected to the driver (bounded by the
  filter size, never by the data size) and inlined as a literal array, so
  executors evaluate membership with pure arithmetic, no broadcast join.
- **Probe**: membership is the AND over ``k`` tests
  ``array[pos >> 6] & (1 << (pos & 63)) != 0`` — a scan-side predicate that
  survives whole-stage codegen and runs *before* any shuffle.
- **Exactness**: a Bloom filter admits false positives, so ``prune`` is
  always followed by the exact join on the survivors; results are exactly
  those of the plain join.  False-positive rate ~``(1 - e^{-kn/m})^k``
  controls the wasted shuffle, not correctness.

At 1000 executors the filter build is one tiny agg + a driver round-trip;
the probe eliminates ``(1 - selectivity - fpr)`` of the big side's shuffle
bytes.  Mirrors the sideways-information-passing of Snowflake's own scan
pruning that the reference relies on implicitly (reference delegates all
joins to the warehouse: app/Auto-Magic Document AI.py:233-260).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k deterministic bit positions in [0, m_bits) for a key column."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def _bit_mask(pos: Column) -> Column:
    """The 64-bit word mask ``1 << (pos % 64)`` for a position Column: a
    lookup into the 64 powers-of-two as signed long literals (bit 63 is
    the sign bit — same two's-complement pattern, expressed negative),
    because shiftleft()'s bit count must be a literal, not a Column.
    Built lazily: F.lit needs an active session."""
    pow2 = F.lit(
        [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]
    ).cast("array<long>")
    return F.element_at(pow2, (pos % 64).cast("int") + 1)


def optimal_params(n_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for ``n_keys`` at the target false-positive rate;
    m rounds up to a multiple of 64."""
    if n_keys <= 0:
        return 64, 1
    m = int(-n_keys * math.log(fpr) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def build_bloom(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5
) -> list[int]:
    """Aggregate the distinct values of ``keys[key_col]`` into a Bloom
    filter, returned as ``m_bits / 64`` signed 64-bit words.

    One wide transform + one groupBy(word) bit_or + a bounded collect of
    at most ``m_bits / 64`` rows (the filter itself, NOT the keys)."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias(
        "pos"
    )
    words = (
        keys.select(pos)
        .select(
            F.shiftright("pos", 6).cast("int").alias("word"),
            _bit_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    filt = [0] * (m_bits // 64)
    for row in words:
        filt[row["word"]] = row["bits"]
    return filt


def might_contain(
    filt: list[int], col: Column, m_bits: int, k: int
) -> Column:
    """Membership-test Column: True for every inserted key, True with
    probability ~fpr for others.  Pure arithmetic over an inlined literal
    array — no join, no shuffle, codegen-friendly.  The filter enters the
    plan as ONE ArrayType Literal (a constant reference in codegen), not a
    CreateArray of m/64 element expressions — so the k probe tests carry k
    constant references, not k * m/64 expression nodes (plan size stays
    O(k) however big the filter is)."""
    arr = F.lit([int(w) for w in filt]).cast("array<long>")
    tests = []
    for p in _positions(col, m_bits, k):
        word = F.element_at(arr, F.shiftright(p, 6).cast("int") + 1)
        tests.append(word.bitwiseAND(_bit_mask(p)) != 0)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    fpr: float = 0.01,
) -> DataFrame:
    """``big`` semi-joined to ``small`` with a Bloom pre-filter: the scan
    of ``big`` drops ~(1 - fpr) of non-matching rows before the exact
    left_semi join removes the false positives.  Output rows exactly equal
    the plain semi join's."""
    small_key = small_key or big_key
    # the distinct key set feeds three consumers (sizing count, filter
    # build, exact backstop join); cache it for the two eager driver-side
    # ones and release it before returning — the lazy backstop join then
    # recomputes the (small) distinct once instead of pinning executor
    # cache for the caller's lifetime (ADVICE r4: no caller-managed leaks)
    keys = small.select(F.col(small_key).alias("_k")).distinct()
    keys.persist()
    try:
        n = keys.count()
        m_bits, k = optimal_params(n, fpr)
        filt = build_bloom(keys, "_k", m_bits, k)
    finally:
        keys.unpersist(blocking=False)
    pruned = big.where(might_contain(filt, F.col(big_key), m_bits, k))
    return pruned.join(
        keys.withColumnRenamed("_k", big_key), on=big_key, how="left_semi"
    )
