"""round 9: end-to-end stream-stream interval join

(split from the flat queries.py, round 10 - content unchanged)"""

from __future__ import annotations

from ._common import (
    F,
    _EAV_SQL,
    _c,
    _cents,
    _docs_pipeline_eav,
    _events,
    _par,
    _scoped_conf,
    _stream_shuffle_partitions,
    os,
)

# ---------------------------------------------------------------------------
# round 9: the stream-stream interval join driven end-to-end (VERDICT r8 #3
# — the last unit-only streaming surface gets driver evidence)


def streaming_interval_join_attribution(spark, sf_dir):
    """Watermark-bounded stream-stream interval join driven END-TO-END
    through Structured Streaming (VERDICT r8 #3): the fixture's view and
    purchase events are landed as two file streams, joined by
    `streaming.joins.interval_attribution_join` — inner join on user with
    the time-range condition `view.ts <= purchase.ts <= view.ts + 1h`,
    watermarks on BOTH sides so Spark bounds the join state to the
    in-flight horizon (the only plan shape Spark accepts in append mode,
    and the only one that survives 100 TB: state is O(horizon), never the
    full history) — drained with trigger(availableNow) into parquet, and
    the LANDED files are aggregated into a per-user attribution report.
    The batch twin of the same join is SQL-expressible, so the entry
    carries a full DuckDB oracle: purchases sum in integer cents, each
    (view, purchase) pair counted exactly once, per-pair semantics
    identical in both engines (micros arithmetic; 1 h = 3.6e9 us).

    Reference parity: the reference's upload loop correlates ONE stream
    against static tables (`app/Auto-Magic Document AI.py` upload
    tracking); stream x stream attribution is the continuous-pipeline
    extension of that surface."""
    import shutil
    import tempfile

    from unstructured_data_pipeline_spark.streaming.joins import (
        interval_attribution_join,
    )

    ev = _events(spark, sf_dir).select(
        "user_id",
        F.timestamp_micros(F.col("ts")).alias("ts"),
        "event_type",
        _cents(F.col("value")).alias("value"),
    )
    root = tempfile.mkdtemp(prefix="udp_sjoin_")
    try:
        v_dir = os.path.join(root, "views")
        p_dir = os.path.join(root, "purchases")
        out_dir = os.path.join(root, "attributed")
        views_src = ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts"
        )
        purchases_src = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        )
        # one file per side -> one availableNow micro-batch: the complete
        # interval join lands (no cross-batch late-arrival drops), so the
        # streaming result equals the batch twin bit-for-bit — the same
        # replay-determinism contract streaming_intake_eav uses.
        # round 14 (guide §2.6): the two landing writes are independent
        # single-file jobs into disjoint dirs — overlap them so the second
        # doesn't wait out the first's tail.
        _par(
            lambda: views_src.coalesce(1).write.parquet(v_dir),
            lambda: purchases_src.coalesce(1).write.parquet(p_dir),
        )
        views = spark.readStream.schema(views_src.schema).parquet(v_dir)
        purchases = spark.readStream.schema(purchases_src.schema).parquet(
            p_dir
        )
        joined = interval_attribution_join(
            views, purchases, horizon="1 hour", watermark="2 hours"
        )
        # round 13: every stateful-stream shuffle partition owns state
        # stores that pay per-micro-batch commit I/O regardless of state
        # held — size the drain's partitioning to state volume, not core
        # count (6-11 s -> ~2.5 s at sf0.1, identical output; see
        # `_common._stream_shuffle_partitions`).  Scoped set/restore so
        # the session's batch shuffle sizing is untouched.
        with _scoped_conf(
            spark,
            "spark.sql.shuffle.partitions",
            _stream_shuffle_partitions(spark),
        ):
            q = (
                joined.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        agg = (
            spark.read.parquet(out_dir)
            .groupBy(F.col("v_user").alias("user_id"))
            .agg(
                F.count(F.lit(1)).alias("n_attributed"),
                F.sum("p_value").cast("long").alias("sum_value_cents"),
            )
            .orderBy("user_id")
        )
        # ADVICE r9: the output is a small per-user aggregate, so rebuild it
        # as a local-relation DataFrame instead of caching a lineage rooted in
        # the about-to-be-deleted temp dir — no dependence on cache residency
        # (a lost cached block would otherwise FileNotFoundException), and no
        # leaked cached frame per bench invocation.
        out = spark.createDataFrame(agg.collect(), schema=agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out.orderBy("user_id")


STREAM_INTERVAL_JOIN_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, {_c('value')} AS cents, event_type
  FROM events
),
v AS (SELECT user_id, us FROM ev WHERE event_type = 'view'),
p AS (SELECT user_id, us, cents FROM ev WHERE event_type = 'purchase')
SELECT v.user_id AS user_id,
       COUNT(*) AS n_attributed,
       CAST(SUM(p.cents) AS BIGINT) AS sum_value_cents
FROM v JOIN p ON p.user_id = v.user_id
             AND p.us >= v.us AND p.us <= v.us + 3600000000
GROUP BY v.user_id ORDER BY user_id
"""


def pipeline_flaky_transport_recovery(spark, sf_dir):
    """Retry/backoff (C4) as an oracle-verified property: the SAME
    classify+extract pipeline as `pipeline_extract_eav`, but every AI call
    crosses `ai.remote.RemoteBackendAdapter` over a `FlakyStubTransport`
    that raises a transient 503 on the FIRST attempt for ~half of all
    distinct payloads (per-payload md5 coin, per-process attempt memory).
    `retry_with_backoff` absorbs every failure in-process on the executor
    that hit it — no driver coordination (the reference's fixed-count
    retry decorator, `app/Auto-Magic Document AI.py:464-470`, runs
    client-side the same way) — so the per-class/field EAV rollup must
    hash-match the CLEAN stub semantics the DuckDB oracle computes.  A
    max_attempts=1 adapter over the same transport fails outright
    (unit-pinned, tests/test_round9_ops.py), proving the green row is the
    retry's doing, not a benign transport."""
    from unstructured_data_pipeline_spark.ai.remote import (
        FlakyStubTransport,
        RemoteBackendAdapter,
        no_sleep,
    )

    backend = RemoteBackendAdapter(FlakyStubTransport(), sleep=no_sleep)
    eav = _docs_pipeline_eav(spark, sf_dir, backend=backend)
    return (
        eav.groupBy("class_name", "field_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("field_value").alias("n_distinct_values"),
        )
        .orderBy("class_name", "field_name")
    )


FLAKY_RECOVERY_SQL = (
    _EAV_SQL
    + "SELECT class_name, field_name, COUNT(*) AS n_rows, "
    "COUNT(DISTINCT field_value) AS n_distinct_values FROM eav "
    "GROUP BY class_name, field_name ORDER BY class_name, field_name"
)


