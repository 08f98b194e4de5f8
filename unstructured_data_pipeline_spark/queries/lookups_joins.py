"""4-8: point lookup, predicates, decorrelated joins (S2, P*, J1-J4)

(split from the flat queries.py, round 10 - content unchanged)"""

from __future__ import annotations

from ._common import F, _c, _cents, _t

# ---------------------------------------------------------------------------
# 4-8: point lookup, predicates, decorrelated joins (S2, P*, J1-J4)


def point_lookup_customer(spark, sf_dir):
    return _t(spark, sf_dir, "customer").filter(F.col("c_custkey") == 42)


POINT_LOOKUP_SQL = "SELECT * FROM customer WHERE c_custkey = 42"


def filter_predicates_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.lower(F.col("c_name")).like("%5%")
            & (F.coalesce(F.col("c_acctbal"), F.lit(0.0)) > 1000.0)
        )
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            "c_acctbal",
            F.when(F.col("c_acctbal") > 5000, "high").otherwise("low").alias("tier"),
        )
        .orderBy("c_custkey")
    )


FILTER_PRED_SQL = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       CASE WHEN c_acctbal > 5000 THEN 'high' ELSE 'low' END AS tier
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND lower(c_name) LIKE '%5%'
  AND COALESCE(c_acctbal, 0) > 1000
ORDER BY c_custkey
"""


def customer_order_stats(spark, sf_dir):
    """J1+J2 decorrelated: the reference's correlated MAX/COUNT subqueries
    (`app.py:708-713`) as one aggregate + left join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    agg = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("_last"),
        F.sum(_cents(F.col("o_totalprice"))).alias("_cents"),
    )
    return (
        cust.join(agg, cust.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("_n"), F.lit(0)).alias("order_count"),
            F.coalesce(F.col("_last"), F.lit("none")).alias("last_order_date"),
            (F.coalesce(F.col("_cents"), F.lit(0)) / 100.0).alias("total_spent"),
        )
    )


CUSTOMER_ORDER_STATS_SQL = f"""
SELECT c_custkey, c_name,
       COALESCE(n, 0) AS order_count,
       COALESCE(last_d, 'none') AS last_order_date,
       COALESCE(cents, 0) / 100.0 AS total_spent
FROM customer
LEFT JOIN (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
         MAX(strftime(o_orderdate, '%Y-%m-%d')) AS last_d,
         CAST(SUM({_c('o_totalprice')}) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
ORDER BY c_custkey
"""


def semi_join_big_spenders(spark, sf_dir):
    """J3/P5: EXISTS as left-semi join."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
ORDER BY c_custkey
"""


def anti_join_modest_customers(spark, sf_dir):
    """J4/P6: NOT EXISTS as left-anti join."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
ORDER BY c_custkey
"""


