"""1-3: TPC-H-shaped headline queries (S1, A*, J*)

(split from the flat queries.py, round 10 - content unchanged)"""

from __future__ import annotations

from ._common import F, _c, _cents, _t

# ---------------------------------------------------------------------------
# 1-3: TPC-H-shaped headline queries (scan/filter/join/agg — S1, A*, J*)


def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1999-01-01").cast("timestamp_ntz")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(_cents(F.col("l_quantity"))) / 100.0).alias("sum_qty"),
        (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("sum_base_price"),
        (F.sum(_cents(disc)) / 100.0).alias("sum_disc_price"),
        (F.sum(_cents(charge)) / 100.0).alias("sum_charge"),
        (F.sum(_cents(F.col("l_quantity"))) / 100.0 / F.count(F.lit(1))).alias("avg_qty"),
        (F.sum(_cents(F.col("l_extendedprice"))) / 100.0 / F.count(F.lit(1))).alias(
            "avg_price"
        ),
        (F.sum(_cents(F.col("l_discount"))) / 100.0 / F.count(F.lit(1))).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g.orderBy("l_returnflag", "l_linestatus")


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  SUM({_c('l_quantity')}) / 100.0 AS sum_qty,
  SUM({_c('l_extendedprice')}) / 100.0 AS sum_base_price,
  SUM({_c('l_extendedprice * (1 - l_discount)')}) / 100.0 AS sum_disc_price,
  SUM({_c('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}) / 100.0 AS sum_charge,
  SUM({_c('l_quantity')}) / 100.0 / COUNT(*) AS avg_qty,
  SUM({_c('l_extendedprice')}) / 100.0 / COUNT(*) AS avg_price,
  SUM({_c('l_discount')}) / 100.0 / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_revenue_orders(spark, sf_dir):
    cutoff = F.lit("1998-01-01").cast("timestamp_ntz")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    g = j.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        (F.sum(_cents(rev)) / 100.0).alias("revenue")
    )
    return g.select(
        "o_orderkey",
        (F.date_format("o_orderdate", "yyyy-MM-dd")).alias("o_orderdate"),
        "o_orderpriority",
        "revenue",
    ).orderBy(F.desc("revenue"), "o_orderkey").limit(10)


Q3_SQL = f"""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
       SUM({_c('l_extendedprice * (1 - l_discount)')}) / 100.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q5_region_volume(spark, sf_dir):
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = _t(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy("n_name")
        .agg((F.sum(_cents(rev)) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = f"""
SELECT n_name, SUM({_c('l_extendedprice * (1 - l_discount)')}) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


