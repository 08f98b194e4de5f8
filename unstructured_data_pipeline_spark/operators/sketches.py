"""One-pass frequency sketches: distributed Misra-Gries heavy hitters.

The 100 TB substitute for "exact top-k tokens over the corpus" when the
item domain is huge (URLs, shingles, n-grams): each Arrow batch is
compressed to a Misra-Gries summary of at most ``k`` (item, weight)
entries — row-local, bounded memory — and the global merge is ONE
map-side-combinable groupBy sum.  Nothing ever shuffles proportional to
the raw token volume, and no executor holds more than k counters per
batch.

Error contract (the mergeable-summaries result, Agarwal et al., PODS'12):
MG compression only ever SUBTRACTS mass, and each compression of a batch
of n_b items subtracts at most n_b/(k+1) from any item, so after the
global sum every item satisfies

    true_count - n/(k+1)  <=  est  <=  true_count

independent of how rows were partitioned into batches.  Consequently any
item with true_count > n/(k+1) is guaranteed PRESENT (est > 0) — the
heavy-hitter completeness guarantee the contract query hash-gates.

Exact counterpart: a plain groupBy count (``corpus_top_terms``).  The
sketch wins when distinct items dominate memory, exactly like HLL vs
COUNT(DISTINCT) (``sketch_event_stats``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_heavy_hitters(
    df: DataFrame, item_col: str, k: int = 256
) -> DataFrame:
    """Misra-Gries heavy-hitter estimates over ``df[item_col]``.

    Returns (item, est) with est in [true - n/(k+1), true]; items whose
    true count is <= their batch-local subtraction may be absent — by the
    bound above, anything with true count > n/(k+1) survives.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts = pdf[item_col].value_counts()  # exact within the batch
            if len(counts) > k:
                # MG compress: subtract the (k+1)-th largest count from
                # every counter, keep the positive ones (<= k survive)
                sub = counts.iloc[k]
                counts = counts - sub
                counts = counts[counts > 0]
            out = counts.reset_index()
            out.columns = ["item", "est"]
            yield out

    summaries = df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        summarize, "item string, est long"
    )
    # global merge: sums of per-batch MG summaries keep the error bound
    # (each summary under-counts by at most its batch's n_b/(k+1))
    return summaries.groupBy("item").agg(F.sum("est").alias("est"))
