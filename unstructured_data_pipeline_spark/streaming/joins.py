"""Stream-stream joins: watermark-bounded interval attribution.

The reference's upload-tracking loop only ever correlates one stream with
static tables (`app.py:905-940` polls new uploads against control tables),
but a continuous pipeline also needs stream x stream correlation — the
classic shape is attribution: join a purchase stream to the view stream
row that preceded it within a horizon.

Spark's stream-stream inner join requires exactly what makes it scale:
watermarks on BOTH sides plus a time-range join condition.  Together they
bound the join state — each side buffers only rows younger than
(watermark + horizon), and state for older event-time is evicted, so a
1000-executor job holds O(in-flight horizon) state per key range, never
the full history.  Without the range condition Spark would have to keep
every row forever (and rejects the plan in append mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join each purchase to the view(s) it follows within
    ``horizon``, per user.  Both inputs must carry ``user_id``, ``ts``;
    purchases also ``value``.  Works identically on streaming and batch
    frames (the batch twin is the oracle in tests)."""
    v = views.select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    if views.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    return v.join(
        p,
        F.expr(
            f"v_user = p_user AND p_ts >= v_ts "
            f"AND p_ts <= v_ts + interval {horizon}"
        ),
    ).select("v_user", "v_ts", "p_ts", "p_value")
