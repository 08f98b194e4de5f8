"""9-16: windows, aggregates, set ops, scalars, pivot (W*, A*, O*, 2.7, C5)

(split from the flat queries.py, round 10 - content unchanged)"""

from __future__ import annotations

from ._common import F, Window, _c, _cents, _events, _heavy, _t

# ---------------------------------------------------------------------------
# 9-16: windows, aggregates, set ops, scalars, pivot (W*, A*, O*, §2.7, C5)


def latest_event_per_user(spark, sf_dir):
    """W1: the QUALIFY ROW_NUMBER latest-per-key dedup (`app.py:717`)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.col("ts").alias("ts_us"),
        )
    )


LATEST_EVENT_SQL = """
SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      FROM events) t
WHERE rn = 1 ORDER BY user_id
"""


def top_users_per_event_type(spark, sf_dir):
    """W2 extended: rank over grouped totals, top-3 per event type."""
    ev = _events(spark, sf_dir)
    totals = ev.groupBy("event_type", "user_id").agg(
        F.sum(_cents(F.col("value"))).alias("_cents")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("_cents"), F.asc("user_id"))
    return (
        totals.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "event_type", "user_id", (F.col("_cents") / 100.0).alias("total_value"), "rnk"
        )
        .orderBy("event_type", "rnk")
    )


TOP_USERS_SQL = f"""
SELECT event_type, user_id, cents / 100.0 AS total_value, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT event_type, user_id, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents DESC, user_id) AS rnk
  FROM (SELECT event_type, user_id, CAST(SUM({_c('value')}) AS BIGINT) AS cents
        FROM events GROUP BY event_type, user_id) t
) r WHERE rnk <= 3 ORDER BY event_type, rnk
"""


def event_type_summary(spark, sf_dir):
    """A1: COUNT(DISTINCT) + GROUP BY + ORDER BY agg DESC (`app.py:678-688`)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (F.sum(_cents(F.col("value"))) / 100.0).alias("total_value"),
        )
        .orderBy(F.desc("n_events"), "event_type")
    )


EVENT_SUMMARY_SQL = f"""
SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       SUM({_c('value')}) / 100.0 AS total_value
FROM events GROUP BY event_type ORDER BY n_events DESC, event_type
"""


def global_order_stats(spark, sf_dir):
    """A2: ungrouped aggregates + COALESCE-over-empty (`app.py:362`)."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("last_order_date"),
        F.max("o_totalprice").alias("max_price"),
        (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("total_revenue"),
        F.coalesce(
            F.max(F.when(F.col("o_orderstatus") == "X", F.col("o_totalprice"))),
            F.lit(0.0),
        ).alias("max_x_price"),
    )


GLOBAL_ORDER_STATS_SQL = f"""
SELECT COUNT(*) AS n_orders,
       MAX(strftime(o_orderdate, '%Y-%m-%d')) AS last_order_date,
       MAX(o_totalprice) AS max_price,
       SUM({_c('o_totalprice')}) / 100.0 AS total_revenue,
       COALESCE(MAX(CASE WHEN o_orderstatus = 'X' THEN o_totalprice END), 0.0) AS max_x_price
FROM orders
"""


def distinct_sources_by_lang(spark, sf_dir):
    """A6/O4: distinct-set accumulation as sorted collect_set."""
    d = _heavy(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources_csv"),
        )
        .orderBy("lang")
    )


DISTINCT_SOURCES_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv
FROM documents GROUP BY lang ORDER BY lang
"""


def union_distinct_labels(spark, sf_dir):
    """O3: union + distinct across two catalogs of labels."""
    ev = _events(spark, sf_dir).select(F.col("event_type").alias("label"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("label"))
    return ev.union(o).distinct().orderBy("label")


UNION_LABELS_SQL = """
SELECT event_type AS label FROM events
UNION
SELECT o_orderstatus FROM orders
ORDER BY label
"""


def scalar_functions_suite(spark, sf_dir):
    """Section 2.7 scalars: regexp/split_part/lower/concat/ilike/coalesce/
    iff/json-path/try_to_timestamp — one projection over events."""
    ev = _events(spark, sf_dir)
    ts_str = F.date_format(
        F.try_to_timestamp(F.lit("2024-01-15 10:30:00")), "yyyy-MM-dd HH:mm:ss"
    )
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.concat(F.col("event_type"), F.lit("/"), F.col("user_id").cast("string")).alias(
            "concat_col"
        ),
        F.upper("event_type").alias("upper_col"),
        F.regexp_replace("event_type", "^e", "E").alias("regex_col"),
        F.split_part(F.col("event_type"), F.lit("r"), F.lit(1)).alias("split_head"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("none")).alias(
            "coalesce_col"
        ),
        F.when(F.col("value") > 250, "hi").otherwise("lo").alias("iff_col"),
        F.col("event_type").ilike("%IEW%").alias("ilike_flag"),
        ts_str.alias("ts_fixed"),
    )


SCALAR_SUITE_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       event_type || '/' || CAST(user_id AS VARCHAR) AS concat_col,
       upper(event_type) AS upper_col,
       regexp_replace(event_type, '^e', 'E') AS regex_col,
       split_part(event_type, 'r', 1) AS split_head,
       COALESCE(NULLIF(event_type, 'error'), 'none') AS coalesce_col,
       CASE WHEN value > 250 THEN 'hi' ELSE 'lo' END AS iff_col,
       event_type ILIKE '%IEW%' AS ilike_flag,
       strftime(TRY_CAST('2024-01-15 10:30:00' AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_fixed
FROM events ORDER BY event_id
"""

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_values(spark, sf_dir):
    """C5: dynamic pivot long->wide with a known value domain (no extra
    distinct job — values passed explicitly)."""
    ev = _events(spark, sf_dir)
    p = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.sum(_cents(F.col("value"))))
    )
    cols = [(F.coalesce(F.col(t), F.lit(0)) / 100.0).alias(t) for t in EVENT_TYPES]
    return p.select("user_id", *cols)


PIVOT_SQL = f"""
SELECT user_id,
  {', '.join(f"SUM(CASE WHEN event_type = '{t}' THEN {_c('value')} ELSE 0 END) / 100.0 AS {t}" for t in EVENT_TYPES)}
FROM events GROUP BY user_id ORDER BY user_id
"""


