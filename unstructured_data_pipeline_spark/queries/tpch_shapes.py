"""remaining TPC-H operator shapes on the fixture schema

(split from the flat queries.py, round 10 - content unchanged)"""

from __future__ import annotations

from ._common import F, TX, Window, _c, _cents, _events, _heavy, _t
from .dedup_text import _kmv_val_spark, _kmv_val_sql

# ---------------------------------------------------------------------------
# remaining TPC-H operator shapes, adapted to the fixture schema (no partsupp
# table, no commit/receipt dates) — the operator SHAPE is what's exercised:
# conditional-share aggregation (q8), scalar-subquery HAVING (q11), CASE
# aggregation over a join (q12), OR-of-ANDs pushdown (q19), semi-join over an
# aggregate threshold (q20), exists/not-exists self-correlation (q21).


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of a region's revenue by
    order year.  Conditional aggregation over a 5-way join; dims broadcast,
    the single shuffle is the final tiny groupBy(year)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cust_nat = c.join(
        F.broadcast(n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])),
        c["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nat = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation"))),
        s["s_nationkey"] == F.col("_snk"),
    ).select("s_suppkey", "supp_nation")
    vol = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust_nat, o["o_custkey"] == cust_nat["c_custkey"])
        .join(F.broadcast(supp_nat), li["l_suppkey"] == supp_nat["s_suppkey"])
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volc"), "supp_nation")
    )
    return (
        j.groupBy("o_year")
        .agg(
            (F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volc")).otherwise(F.lit(0))) / 100.0).alias("nation_volume"),
            (F.sum("volc") / 100.0).alias("total_volume"),
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volc")).otherwise(F.lit(0)))
                / F.sum("volc")
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
WITH j AS (
  SELECT year(o_orderdate) AS o_year,
         {_c('l_extendedprice * (1 - l_discount)')} AS volc,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey)
SELECT o_year,
       SUM(CASE WHEN supp_nation = 'NATION_3' THEN volc ELSE 0 END) / 100.0 AS nation_volume,
       SUM(volc) / 100.0 AS total_volume,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volc ELSE 0 END) AS DOUBLE)
         / SUM(volc) AS mkt_share
FROM j GROUP BY o_year ORDER BY o_year
"""


def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (no partsupp fixture: phrased over lineitem revenue):
    parts whose revenue exceeds a fraction of TOTAL revenue — per-key
    aggregate filtered against a broadcast ungrouped-scalar aggregate.  The
    per-part agg is map-side combinable; the scalar is a second, cheap pass
    (at 100 TB both passes share the one scan via cache or a two-level agg)."""
    li = _t(spark, sf_dir, "lineitem")
    vol = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_part = li.groupBy("l_partkey").agg(F.sum(vol).alias("_valc"))
    total = li.agg(F.sum(vol).alias("_tot"))
    return (
        per_part.join(F.broadcast(total), F.col("_valc") > F.col("_tot") * 0.001)
        .select("l_partkey", (F.col("_valc") / 100.0).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = f"""
SELECT l_partkey, SUM({_c('l_extendedprice * (1 - l_discount)')}) / 100.0 AS part_value
FROM lineitem GROUP BY l_partkey
HAVING SUM({_c('l_extendedprice * (1 - l_discount)')}) >
  (SELECT SUM({_c('l_extendedprice * (1 - l_discount)')}) FROM lineitem) * 0.001
ORDER BY part_value DESC, l_partkey
"""


def q12_late_priority_counts(spark, sf_dir):
    """TPC-H Q12 shape (no shipmode column: grouped by l_linestatus): for
    items shipped > 60 days after order date, count critical-priority vs
    other orders — CASE aggregation over a large fact-fact join keyed on
    l_orderkey (the natural co-partitioning key at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning both
    join sides.  The shared conjunct (the join key) stays in the join; the
    disjunction is a post-join filter Catalyst can partially push to each
    scan (brand/size reach the part scan, quantity reaches lineitem)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    pred = (
        ((b == "Brand#1") & sz.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#2") & sz.between(10, 25) & q.between(10, 30))
        | ((b == "Brand#3") & sz.between(20, 50) & q.between(20, 40))
    )
    return j.filter(pred).agg(
        (F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = f"""
SELECT SUM({_c('l_extendedprice * (1 - l_discount)')}) / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


def q20_promo_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (no partsupp: availability proxied by shipped
    quantity): suppliers whose PROMO-part shipped quantity exceeds 1.5x the
    average across suppliers — aggregate -> scalar threshold -> semi-join
    back to the supplier dimension for names."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    qty = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).groupBy(
        "l_suppkey"
    ).agg(F.sum(_cents(F.col("l_quantity"))).alias("_qtyc"))
    thresh = qty.agg((F.avg("_qtyc") * 1.5).alias("_th"))
    heavy = qty.join(F.broadcast(thresh), F.col("_qtyc") > F.col("_th")).select("l_suppkey")
    return (
        s.join(heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH qty AS (
  SELECT l_suppkey, SUM({_c('l_quantity')}) AS qtyc
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO' GROUP BY l_suppkey)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM qty WHERE qtyc > (SELECT AVG(qtyc) * 1.5 FROM qty))
ORDER BY s_name
"""


def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (lateness proxied by l_returnflag = 'R'): suppliers
    who were the SOLE failing supplier on a finished multi-supplier order.
    The exists / not-exists pair decorrelates into two aggregates over the
    same (orderkey -> supplier-set) shuffle: distinct suppliers per order
    and distinct FAILING suppliers per order."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    items = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = items.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias(
            "n_fail"
        ),
        F.max(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias("fail_supp"),
    )
    sole = per_order.filter((F.col("n_supp") > 1) & (F.col("n_fail") == 1))
    return (
        sole.groupBy("fail_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("fail_supp") == s["s_suppkey"])
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
    )


Q21_SQL = """
WITH items AS (
  SELECT l_orderkey, l_suppkey, l_returnflag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_fail,
         MAX(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS fail_supp
  FROM items GROUP BY l_orderkey)
SELECT s_name, COUNT(*) AS numwait
FROM per_order JOIN supplier ON fail_supp = s_suppkey
WHERE n_supp > 1 AND n_fail = 1
GROUP BY s_name ORDER BY numwait DESC, s_name
"""


def grouping_sets_order_stats(spark, sf_dir):
    """GROUPING SETS with grouping() flags — the generalized rollup/cube
    surface (SURVEY section 2.4 notes Spark's hash aggregate covers these).
    One shuffle; Spark expands the sets map-side."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_prio,
               COUNT(*) AS n_orders,
               CAST(SUM({_c('o_totalprice')}) AS DOUBLE) / 100.0 AS total_value
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
        """
    )


GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_prio,
       COUNT(*) AS n_orders,
       SUM({_c('o_totalprice')}) / 100.0 AS total_value
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
"""


def window_lead_lag_ntile(spark, sf_dir):
    """Analytic-window suite: lag (gap-to-previous), lead (next event type),
    ntile quartile and percent_rank per user timeline — one window spec, one
    shuffle on user_id, unique (us, event_id) ordering for determinism."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", F.col("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        (F.col("us") - F.lag("us").over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


LEAD_LAG_SQL = """
SELECT user_id, event_id, event_type,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
       LEAD(event_type) OVER w AS next_type,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
ORDER BY user_id, event_id
"""


def range_join_views_before_purchase(spark, sf_dir):
    """Interval/range join, the bucketed scale shape: for every purchase,
    count the same user's views in the preceding hour.  Naive form is a
    theta-join (user equi + time range) whose fan-out explodes at scale;
    here views are bucketed ONCE by hour and each purchase probes exactly
    two buckets (its own and the previous), so the join is a bounded
    equi-join on (user_id, bucket) and the range predicate only filters
    within matched buckets."""
    HOUR = 3_600_000_000  # microseconds
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", F.col("ts").alias("us")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("us").alias("vus"),
        F.floor(F.col("us") / HOUR).alias("vb"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.col("us").alias("pus"),
        F.floor(F.col("us") / HOUR).alias("pb"),
    )
    probes = p.select(
        "user_id", "event_id", "pus",
        F.explode(F.array(F.col("pb"), F.col("pb") - 1)).alias("probe"),
    )
    j = probes.join(
        v,
        (probes["user_id"] == v["v_user"]) & (probes["probe"] == v["vb"]),
        "left",
    )
    in_range = F.col("vus").between(F.col("pus") - HOUR, F.col("pus"))
    return (
        j.groupBy("event_id", "user_id", "pus")
        .agg(F.sum(F.when(in_range, 1).otherwise(0)).alias("n_views_prev_hour"))
        .select("event_id", "user_id", "pus", "n_views_prev_hour")
    )


RANGE_JOIN_SQL = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
p AS (SELECT user_id, event_id, us AS pus FROM e WHERE event_type = 'purchase'),
v AS (SELECT user_id, us AS vus FROM e WHERE event_type = 'view')
SELECT p.event_id, p.user_id, p.pus,
       (SELECT COUNT(*) FROM v
        WHERE v.user_id = p.user_id
          AND v.vus BETWEEN p.pus - 3600000000 AND p.pus) AS n_views_prev_hour
FROM p ORDER BY p.event_id
"""


def session_window_native(spark, sf_dir):
    """Spark's NATIVE session_window operator (30-min gap) on event time —
    the streaming-capable sessionizer (same operator works under
    readStream + watermark).  Oracle = the classic SQL islands rewrite;
    Spark's session ends at last_event + gap and an event lands in the
    session when its time <= that end, so an event EXACTLY gap after the
    previous one still MERGES — the island break condition is diff > gap
    (boundary pinned by tests/test_units.py::test_session_window_gap_boundary)."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.timestamp_micros(F.col("ts")).alias("t")
    )
    s = ev.groupBy("user_id", F.session_window("t", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return s.select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("sess_start_us"),
        F.unix_micros(F.col("session_window.end")).alias("sess_end_us"),
        "n_events",
    )


SESSION_WINDOW_SQL = """
WITH o AS (SELECT user_id, epoch_us(ts) AS us FROM events),
m AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
g AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id, MIN(us) AS sess_start_us, MAX(us) + 1800000000 AS sess_end_us,
       COUNT(*) AS n_events
FROM g GROUP BY user_id, sid ORDER BY user_id, sess_start_us
"""


def corr_stats_exact(spark, sf_dir):
    """Statistical profiling with EXACT cross-engine determinism: per
    return flag, Pearson corr(quantity, discount) and sample stddev of
    quantity, computed from integer power sums (quantity is integral,
    discount in cents) — every sum is exact in int64 and < 2^53, so the
    final double formulas are bit-identical in Spark and DuckDB, with no
    reliance on either engine's float-accumulating corr()/stddev()."""
    li = _t(spark, sf_dir, "lineitem")
    qc = F.col("l_quantity").cast("long")
    dc = _cents(F.col("l_discount"))
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qc).alias("sq"),
        F.sum(qc * qc).alias("sqq"),
        F.sum(dc).alias("sd"),
        F.sum(dc * dc).alias("sdd"),
        F.sum(qc * dc).alias("sqd"),
    )
    n, sq, sqq, sd, sdd, sqd = (
        F.col("n").cast("double"),
        F.col("sq").cast("double"),
        F.col("sqq").cast("double"),
        F.col("sd").cast("double"),
        F.col("sdd").cast("double"),
        F.col("sqd").cast("double"),
    )
    corr = (n * sqd - sq * sd) / (
        F.sqrt(n * sqq - sq * sq) * F.sqrt(n * sdd - sd * sd)
    )
    stddev = F.sqrt((n * sqq - sq * sq) / (n * (n - F.lit(1.0))))
    return agg.select(
        "l_returnflag",
        F.col("n").alias("n_items"),
        corr.alias("qty_disc_corr"),
        stddev.alias("qty_stddev"),
    ).orderBy("l_returnflag")


CORR_STATS_SQL = f"""
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(CAST(l_quantity AS BIGINT)) AS sq,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sqq,
         SUM({_c('l_discount')}) AS sd,
         SUM({_c('l_discount')} * {_c('l_discount')}) AS sdd,
         SUM(CAST(l_quantity AS BIGINT) * {_c('l_discount')}) AS sqd
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n AS n_items,
       (n * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * sd)
         / (sqrt(n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq)
            * sqrt(n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd))
         AS qty_disc_corr,
       sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq)
            / (CAST(n AS DOUBLE) * (n - 1))) AS qty_stddev
FROM s ORDER BY l_returnflag
"""


_QC_CENTER = 8 * 16**11  # half of 16^12 — centers the nibble value on 0
_QC_DENOM = 16**12


def quality_classifier_filter(spark, sf_dir):
    """Model-based quality filtering, fastText-linear-classifier shape
    (the FineWeb-Edu / LLaMA 'wiki-like?' gate): per-token weights, a
    length-normalized linear score, sigmoid probability, keep-threshold.
    Weights here are md5-derived stand-ins (deterministic everywhere); a
    real deployment swaps in trained weights as a broadcast table and the
    plan is unchanged.  Numerics are scale- and engine-exact: the score
    numerator stays INTEGER (sum of centered 48-bit token-hash values, one
    exact double division at the end), and the keep decision is an integer
    sign test — so the filter output is bit-identical on any cluster size
    or partitioning, with only the rounded sigmoid touching libm.  Cost:
    one explode + one groupBy(doc) — scan-speed, no joins, no model state
    on the driver."""
    d = _heavy(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != ""
            )
        ).alias("tok"),
    )
    # hash in its own projection: inlining would re-evaluate the md5 once
    # per nibble (12x per token — the CMS entry measured the same pattern
    # 7x slower; CollapseProject keeps the split for non-cheap exprs)
    toks = toks.withColumn("_h", F.md5(F.col("tok")))
    val = _kmv_val_spark(F.col("_h"))
    scored = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(val - F.lit(_QC_CENTER)).alias("s_num"),
    )
    x = F.col("s_num").cast("double") / (
        F.col("n_tokens").cast("double") * F.lit(float(_QC_DENOM))
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round(x, 6).alias("score_r"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), 6).alias("prob_r"),
        (F.col("s_num") >= 0).alias("keep"),
    ).orderBy("doc_id")


QUALITY_CLASSIFIER_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')) AS tok
  FROM documents
),
scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM({_kmv_val_sql('md5(tok)')} - {_QC_CENTER}) AS BIGINT) AS s_num
  FROM toks GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(CAST(s_num AS DOUBLE)
             / (CAST(n_tokens AS DOUBLE) * {float(_QC_DENOM)}), 6) AS score_r,
       round(1.0::DOUBLE / (1.0::DOUBLE + exp(-(CAST(s_num AS DOUBLE)
             / (CAST(n_tokens AS DOUBLE) * {float(_QC_DENOM)})))), 6) AS prob_r,
       s_num >= 0 AS keep
FROM scored ORDER BY doc_id
"""


def skew_salted_join_report(spark, sf_dir):
    """Skew-mitigating salted join (`operators/skew.salted_join`): the
    events fact is collapsed onto a deliberately skewed key (every user not
    divisible by 5 becomes user 0 → one key carries ~80% of the fact — the
    power-law / placeholder-id shape that makes one reducer the straggler
    at 100 TB), then joined to the customer dim through an 8-salt salted
    join: each fact row takes ONE deterministic row-hash salt, the dim is
    replicated once per salt by a row-local explode, and the join key
    becomes (key, salt) so the hot key's rows spread over 8 tasks.  The
    per-segment rollup is hash-gated against the PLAIN join in DuckDB —
    proving the salted pair set is exactly the unsalted one.  The companion
    diagnosis row (`key_skew_metrics`) reports the max/mean key ratio that
    justifies the salt count.  Scale: dim scanned `n_salts` times
    (row-local), fact once; no broadcast-nested-loop anywhere; AQE skew
    join is the adaptive fallback, this is the explicit planner-independent
    form."""
    from unstructured_data_pipeline_spark.operators.skew import salted_join

    ev = _events(spark, sf_dir).select(
        F.when(F.col("user_id") % 5 != 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("hot_user"),
        "event_type",
        "value",
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("hot_user"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, on="hot_user", n_salts=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_cents(F.col("value"))) / 100.0).alias("sum_value"),
            F.countDistinct("hot_user").alias("n_users"),
        )
        .orderBy("c_mktsegment")
    )


SKEW_SALTED_SQL = f"""
WITH ev AS (
  SELECT CASE WHEN user_id % 5 <> 0 THEN 0 ELSE user_id END AS hot_user, value
  FROM events
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM({_c('value')}) / 100.0 AS sum_value,
       CAST(COUNT(DISTINCT hot_user) AS BIGINT) AS n_users
FROM ev JOIN customer ON ev.hot_user = customer.c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def key_skew_diagnosis(spark, sf_dir):
    """The skew diagnosis that precedes a salted join: per-key histogram of
    the same deliberately skewed key, reduced to (rows, keys, hottest-key
    rows, max/mean ratio).  `skew_ratio` >> 1 is the signal to salt, and
    ceil(max_key_rows / target-rows-per-task) sizes `n_salts`.  Two
    map-side-combinable aggregations — a metadata-cost scan at any scale."""
    from unstructured_data_pipeline_spark.operators.skew import key_skew_metrics

    ev = _events(spark, sf_dir).select(
        F.when(F.col("user_id") % 5 != 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("hot_user")
    )
    m = key_skew_metrics(ev, "hot_user")
    return m.select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.round("skew_ratio", 6).alias("skew_ratio_r"),
    )


KEY_SKEW_SQL = """
WITH ev AS (
  SELECT CASE WHEN user_id % 5 <> 0 THEN 0 ELSE user_id END AS hot_user
  FROM events
),
per_key AS (SELECT hot_user, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY hot_user)
SELECT CAST(SUM(n) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(n) AS BIGINT) AS max_key_rows,
       round(MAX(n) / (SUM(n) / COUNT(*)), 6) AS skew_ratio_r
FROM per_key
"""


def training_shard_manifest(spark, sf_dir):
    """Deterministic corpus shuffle + sharding — the final pipeline step
    before training: each doc gets a reproducible pseudo-random position
    (md5 of its id — no RNG/seed coordination; identical order on any
    engine, cluster size, or partitioning), shards are hash-assigned, and
    the manifest gates the GLOBAL training order per shard with an md5
    over the ordered doc_id list, so any ordering deviation flips the
    row.  Scale shape: shard key + sort key are scan-local expressions;
    the ordered rebuild is per-shard (the boilerplate-rebuild
    collect_list/array_sort pattern — each shard is one group, shards are
    the parallelism unit); producing the physical shard files is the same
    plan ending in repartitionByRange(shard, h) .sortWithinPartitions
    .write instead of the manifest aggregate."""
    n_shards = 8
    d = _heavy(spark, sf_dir, "documents").select("doc_id", "text")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = (TX.hex_nibble_value(F.substring(h, 1, 1)) % n_shards).cast("int")
    rows = d.select(
        "doc_id",
        h.alias("h"),
        shard.alias("shard"),
        F.size(TX.tokens_ws("text")).alias("n_toks"),
    )
    return (
        rows.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("h", "doc_id"))),
                        lambda s: s["doc_id"].cast("string"),
                    ),
                    ",",
                )
            ).alias("order_md5"),
        )
        .orderBy("shard")
    )


TRAINING_SHARD_SQL = """
WITH rows_ AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS h,
         CAST((strpos('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 8
              AS INTEGER) AS shard,
         len(string_split(text, ' ')) AS n_toks
  FROM documents
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY h, doc_id))
         AS order_md5
FROM rows_ GROUP BY shard ORDER BY shard
"""


def deterministic_sample_orders(spark, sf_dir):
    """Reproducible 1/16 hash sample (md5 of the key, first hex digit
    '0') rolled up by priority — the scale-correct sampling technique: no
    RNG state, no seed coordination across executors, identical sample on
    any engine/cluster/partitioning, and the predicate evaluates at the
    scan (no shuffle to sample)."""
    o = _t(spark, sf_dir, "orders")
    keep = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0"
    return (
        o.filter(keep)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("sample_value"),
        )
        .orderBy("o_orderpriority")
    )


DET_SAMPLE_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_sampled,
       SUM({_c('o_totalprice')}) / 100.0 AS sample_value
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def window_range_frame_hour(spark, sf_dir):
    """RANGE window frame over event TIME VALUES (not row counts): per
    event, how many of the same user's events landed in the trailing hour.
    Unlike a ROWS frame, peers with equal timestamps are always included
    together, so the result is deterministic under ties."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.col("ts").alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id", "event_id", "us",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


RANGE_FRAME_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS us,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         AS n_last_hour
FROM events ORDER BY user_id, event_id
"""


def unpivot_customer_metrics(spark, sf_dir):
    """Wide->long UNPIVOT (``DataFrame.unpivot``/melt) of three derived
    customer metrics, re-aggregated per metric.  The inverse of the pivot
    operator (C5); map-side row expansion, one tiny final shuffle."""
    c = _t(spark, sf_dir, "customer")
    wide = c.select(
        "c_custkey",
        _cents(F.col("c_acctbal")).alias("acct_cents"),
        F.col("c_nationkey").cast("long").alias("nation"),
        F.length("c_mktsegment").cast("long").alias("seg_len"),
    )
    long = wide.unpivot(
        "c_custkey", ["acct_cents", "nation", "seg_len"], "metric", "value"
    )
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .orderBy("metric")
    )


UNPIVOT_SQL = f"""
WITH long AS (
  SELECT c_custkey, 'acct_cents' AS metric, {_c('c_acctbal')} AS value FROM customer
  UNION ALL
  SELECT c_custkey, 'nation', CAST(c_nationkey AS BIGINT) FROM customer
  UNION ALL
  SELECT c_custkey, 'seg_len', CAST(length(c_mktsegment) AS BIGINT) FROM customer)
SELECT metric, COUNT(*) AS n_rows, CAST(SUM(value) AS BIGINT) AS total,
       MIN(value) AS vmin, MAX(value) AS vmax
FROM long GROUP BY metric ORDER BY metric
"""


def argmax_latest_event(spark, sf_dir):
    """max_by / min_by aggregates (SQL argmax): per user, the event type of
    the highest/lowest event_id — single hash aggregate, no window, no
    self-join.  Keyed on the UNIQUE event_id so ties cannot occur and the
    result is deterministic in both engines."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by("event_type", "event_id").alias("latest_type"),
            F.min_by("event_type", "event_id").alias("first_type"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("user_id")
    )


ARGMAX_SQL = """
SELECT user_id,
       arg_max(event_type, event_id) AS latest_type,
       arg_min(event_type, event_id) AS first_type,
       MAX(event_id) AS max_event_id
FROM events GROUP BY user_id ORDER BY user_id
"""


def bool_bit_aggs(spark, sf_dir):
    """Boolean & bitwise aggregate suite per event type: conditional count
    (FILTER-clause semantics), bool_or/bool_and, bit_or/bit_and over a
    bounded int domain — all map-side-combinable single-pass aggregates."""
    ev = _events(spark, sf_dir)
    vc = _cents(F.col("value"))
    low_byte = F.pmod(F.col("event_id"), F.lit(256)).cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(vc > 10000, 1).otherwise(0)).alias("n_big"),
            F.bool_or(vc > 10000).alias("any_big"),
            F.bool_and(vc >= 0).alias("all_nonneg"),
            F.bit_or(low_byte).alias("id_bits_or"),
            F.bit_and(low_byte).alias("id_bits_and"),
        )
        .orderBy("event_type")
    )


BOOL_BIT_SQL = f"""
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN {_c('value')} > 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       bool_or({_c('value')} > 10000) AS any_big,
       bool_and({_c('value')} >= 0) AS all_nonneg,
       bit_or(CAST(event_id % 256 AS INTEGER)) AS id_bits_or,
       bit_and(CAST(event_id % 256 AS INTEGER)) AS id_bits_and
FROM events GROUP BY event_type ORDER BY event_type
"""


def array_functions_suite(spark, sf_dir):
    """Array-function breadth over the token array: slice, sort, distinct,
    contains, reverse, join — all row-local JVM expressions (the array
    algebra a document pipeline leans on constantly)."""
    d = _heavy(spark, sf_dir, "documents")
    toks = d.select("doc_id", TX.tokens_ws("text").alias("w"))
    return toks.select(
        "doc_id",
        F.array_join(F.slice("w", 1, 3), "-").alias("first3"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct("w")), 1, 5), ","
        ).alias("sorted5"),
        F.size(F.array_distinct("w")).cast("long").alias("n_uniq"),
        F.array_contains("w", "the").alias("has_the"),
        F.element_at(F.reverse("w"), 1).alias("last_tok"),
    )


ARRAY_FUNCS_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       array_to_string(w[1:3], '-') AS first3,
       array_to_string(list_sort(list_distinct(w))[1:5], ',') AS sorted5,
       CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
       list_contains(w, 'the') AS has_the,
       list_reverse(w)[1] AS last_tok
FROM t ORDER BY doc_id
"""


def string_agg_region_nations(spark, sf_dir):
    """LISTAGG/string_agg with DETERMINISTIC ordering: per region, the
    sorted comma-joined nation list.  collect_list has no cross-partition
    order guarantee, so the engine-portable form is collect -> array_sort
    -> join (the only listagg shape that is reproducible at scale)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return (
        j.groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


STRING_AGG_SQL = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def regex_functions_suite(spark, sf_dir):
    """Regex breadth over document text: group extraction, match counting,
    replacement, and anchored matching — all JVM-side (regexp_* family),
    Java and RE2-compatible pattern subset so semantics agree with DuckDB."""
    d = _heavy(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.regexp_count("text", F.lit(r"[aeiou]")).cast("long").alias("n_vowels"),
        F.length(F.regexp_replace("text", r"[aeiou]", "")).cast("long").alias(
            "len_novowels"
        ),
        F.col("text").rlike(r"^[A-Z]").alias("starts_upper"),
    )


REGEX_SUITE_SQL = """
SELECT doc_id,
       regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
       CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels,
       CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
         AS len_novowels,
       regexp_matches(text, '^[A-Z]') AS starts_upper
FROM documents ORDER BY doc_id
"""


def datetime_functions_suite(spark, sf_dir):
    """Date/time function breadth on order dates: truncation, field
    extraction, end-of-month, interval arithmetic, date_diff — rolled up
    per order month so the result is a compact calendar profile.
    Cross-engine notes: Spark dayofweek is 1=Sunday while DuckDB dow is
    0=Sunday (oracle mirrors with +1); both engines' last_day/add_months
    agree on month-end clamping."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.select(
            F.date_format(F.date_trunc("month", d), "yyyy-MM").alias("month"),
            F.dayofweek(d).alias("dow"),
            (F.last_day(d) == d).alias("is_month_end"),
            F.datediff(F.add_months(d, 1), d).cast("long").alias("plus_month_days"),
            F.quarter(d).alias("q"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("dow") == 1, 1).otherwise(0)).alias("n_sunday"),
            F.sum(F.when(F.col("is_month_end"), 1).otherwise(0)).alias("n_month_end"),
            F.min("plus_month_days").alias("min_plus_month_days"),
            F.max("q").alias("q_of_month"),
        )
        .orderBy("month")
    )


DATETIME_SUITE_SQL = """
WITH x AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         dayofweek(o_orderdate) + 1 AS dow,
         last_day(o_orderdate) = o_orderdate AS is_month_end,
         CAST(date_diff('day', o_orderdate,
                        o_orderdate + INTERVAL 1 MONTH) AS BIGINT)
           AS plus_month_days,
         quarter(o_orderdate) AS q
  FROM orders)
SELECT month, COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN dow = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sunday,
       CAST(SUM(CASE WHEN is_month_end THEN 1 ELSE 0 END) AS BIGINT)
         AS n_month_end,
       MIN(plus_month_days) AS min_plus_month_days,
       MAX(q) AS q_of_month
FROM x GROUP BY month ORDER BY month
"""


def null_semantics_suite(spark, sf_dir):
    """ANSI three-valued-logic semantics, cross-engine checked: NOT IN
    against a set CONTAINING NULL is never true (must return 0), IN
    ignores the NULL member, null-safe equality (<=>) matches NULL to
    NULL, and aggregates skip NULLs (COUNT(x) < COUNT(*)).  The trap this
    documents: a NOT-IN denylist with one NULL silently filters out every
    row — the null-aware anti join Spark plans for it is semantically
    required, not an optimizer quirk."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_ns")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_ns")
    return spark.sql(
        """
        WITH v AS (SELECT nullif(n_nationkey % 7, 3) AS k FROM nation_ns),
        x AS (SELECT nullif(c_nationkey % 5, 2) AS nx FROM cust_ns)
        SELECT
          (SELECT COUNT(*) FROM cust_ns
           WHERE c_nationkey NOT IN (SELECT k FROM v)) AS n_notin_nullset,
          (SELECT COUNT(*) FROM cust_ns
           WHERE c_nationkey IN (SELECT k FROM v)) AS n_in_nullset,
          (SELECT COUNT(*) FROM cust_ns
           WHERE c_nationkey NOT IN (SELECT k FROM v WHERE k IS NOT NULL))
            AS n_notin_cleanset,
          (SELECT COUNT(*) FROM v a JOIN v b ON a.k <=> b.k) AS n_nullsafe_pairs,
          (SELECT COUNT(*) FROM x) AS n_total,
          (SELECT COUNT(nx) FROM x) AS n_nonnull,
          (SELECT CAST(SUM(nx) AS BIGINT) FROM x) AS sum_skipping_nulls
        """
    )


NULL_SEMANTICS_SQL = """
WITH v AS (SELECT nullif(n_nationkey % 7, 3) AS k FROM nation),
x AS (SELECT nullif(c_nationkey % 5, 2) AS nx FROM customer)
SELECT
  (SELECT COUNT(*) FROM customer
   WHERE c_nationkey NOT IN (SELECT k FROM v)) AS n_notin_nullset,
  (SELECT COUNT(*) FROM customer
   WHERE c_nationkey IN (SELECT k FROM v)) AS n_in_nullset,
  (SELECT COUNT(*) FROM customer
   WHERE c_nationkey NOT IN (SELECT k FROM v WHERE k IS NOT NULL))
    AS n_notin_cleanset,
  (SELECT COUNT(*) FROM v a JOIN v b ON a.k IS NOT DISTINCT FROM b.k)
    AS n_nullsafe_pairs,
  (SELECT COUNT(*) FROM x) AS n_total,
  (SELECT COUNT(nx) FROM x) AS n_nonnull,
  (SELECT CAST(SUM(nx) AS BIGINT) FROM x) AS sum_skipping_nulls
"""


def json_roundtrip_suite(spark, sf_dir):
    """VARIANT serialization fidelity (SURVEY §7 hard-parts): struct ->
    canonical compact JSON (`to_json`) is BYTE-IDENTICAL across engines
    (key order = struct order, no whitespace, plain integer formatting),
    and the round trip back out (path extraction + typed `from_json`)
    recovers the original values.  This is the encoding contract the
    pipeline's VARIANT columns (prompts, extraction results, field
    values) rely on for oracle-hashable persistence."""
    c = _t(spark, sf_dir, "customer")
    j = F.to_json(
        F.struct(
            F.col("c_custkey").alias("id"),
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nk"),
        )
    )
    arr = F.to_json(F.array(F.col("c_custkey"), F.col("c_nationkey")))
    return c.select(
        "c_custkey",
        j.alias("doc_json"),
        F.get_json_object(j, "$.seg").alias("seg_back"),
        F.from_json(j, "id long, seg string, nk long")["nk"].alias("nk_back"),
        F.json_array_length(arr).cast("long").alias("arr_len"),
    )


JSON_ROUNDTRIP_SQL = """
WITH x AS (
  SELECT c_custkey,
         CAST(to_json(struct_pack(id := c_custkey, seg := c_mktsegment,
                                  nk := c_nationkey)) AS VARCHAR) AS j,
         CAST(to_json([c_custkey, c_nationkey]) AS VARCHAR) AS arr
  FROM customer)
SELECT c_custkey, j AS doc_json,
       json_extract_string(j, '$.seg') AS seg_back,
       CAST(json_extract(j, '$.nk') AS BIGINT) AS nk_back,
       CAST(json_array_length(arr) AS BIGINT) AS arr_len
FROM x ORDER BY c_custkey
"""


