"""Further TPC-H-shaped analytics over the fixture star schema (EXT —
public TPC-H spec adapted to the fixture's columns: no partsupp table,
no commit/receipt dates, so Q2/Q4/Q9/Q11/Q16/Q20/Q21 shapes are out of
reach and the rest are adapted where a spec column is missing).

All QUERIES_TAIL (post-gate-cap; hard signal = the parametrized local
oracle sweep in tests/test_clustering.py). Determinism rules as
registry.py: decimal accumulation for every double sum, window totals
over decimals, total orderings on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources import load_table
from .relational import _ddsum_sql, _dsum

REVENUE_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


def _revenue() -> F.Column:
    # Built lazily: constructing a Column requires an active
    # SparkContext, and this module is imported (registry collection,
    # pytest collection) before any session exists.
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")


# --- Q7-style nation trade flows --------------------------------------------

def q7_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10 (supplier nation → customer nation, year) revenue flows
    (TPC-H Q7 adapted: the spec pins one nation pair, but the fixture's
    10 suppliers cover few nations, so a pinned pair can be empty at
    small SFs — rank all cross-nation flows instead; same join tree)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(_revenue()).alias("rev_dec"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "supp_nation", "cust_nation", "l_year")
        .limit(10)
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, CAST(rev_dec AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year, SUM({REVENUE_SQL}) AS rev_dec
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name != n2.n_name
  GROUP BY 1, 2, 3
)
ORDER BY revenue DESC, supp_nation, cust_nation, l_year
LIMIT 10
"""


# --- Q8-style national market share -----------------------------------------

def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each supplier nation's share of yearly PROMO-part revenue
    (TPC-H Q8 adapted: share of the whole market rather than one
    region's — the fixture's supplier nations are sparse). Share =
    ratio of two exact decimal sums (window total over decimals),
    deterministic doubles."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("l_year"), F.col("n_name").alias("supp_nation"))
        .agg(F.sum(_revenue()).alias("rev_dec"))
    )
    total = F.sum("rev_dec").over(W.partitionBy("l_year"))
    return per.select(
        "l_year",
        "supp_nation",
        F.col("rev_dec").cast("double").alias("revenue"),
        (F.col("rev_dec").cast("double") / total.cast("double")).alias("mkt_share"),
    )


Q8_SQL = f"""
WITH per AS (
  SELECT year(l_shipdate) AS l_year, n_name AS supp_nation,
         SUM({REVENUE_SQL}) AS rev_dec
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_type = 'PROMO'
  GROUP BY 1, 2
)
SELECT l_year, supp_nation,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER (PARTITION BY l_year) AS DOUBLE) AS mkt_share
FROM per
"""


# --- Q13-style order-count distribution -------------------------------------

def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer INCLUDING zero-order customers
    (TPC-H Q13 shape: left join → per-customer count → distribution
    over counts)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .select(F.col("c_count").cast("long").alias("c_count"), "custdist")
    )


Q13_SQL = """
SELECT CAST(c_count AS BIGINT) AS c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --- Q18-style large-quantity orders ----------------------------------------

LARGE_ORDER_QTY = 200.0  # ~p93 of per-order quantity at every fixture SF


def q18_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds the threshold, with their
    customer (TPC-H Q18 shape: agg-filtered fact join), top 20 by
    quantity."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > LARGE_ORDER_QTY)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            "total_qty",
            "o_totalprice",
        )
        .orderBy(F.desc("total_qty"), F.asc("orderkey"))
        .limit(20)
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey AS orderkey, total_qty, o_totalprice
FROM (
  SELECT l_orderkey, {_ddsum_sql('l_quantity')} AS total_qty
  FROM lineitem GROUP BY l_orderkey
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > {LARGE_ORDER_QTY}
ORDER BY total_qty DESC, orderkey ASC
LIMIT 20
"""


# --- Q19-style disjunctive-predicate revenue --------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under three OR-ed brand/size/quantity baskets (TPC-H
    Q19 shape — the disjunction exercises Catalyst's predicate
    handling across a join: brand/size push to the part scan,
    quantity to lineitem, the cross-side disjunction stays in the
    join filter)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    basket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(basket)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


Q19_SQL = f"""
SELECT CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


# --- Q22-style idle high-balance customers ----------------------------------

def q22_idle_balance_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per market segment: customers whose balance beats the average
    positive balance and who placed no URGENT order (TPC-H Q22
    adapted: mktsegment for the missing phone country code, URGENT
    anti-join for the missing 7-year window — same scalar-subquery +
    anti-join + grouped-agg shape). Threshold = exact decimal sum /
    exact count → deterministic double. The fixture spells the top
    priority '1-URGENT' (not 'URGENT' — ADVICE r02: the bare literal
    matched nothing, making the anti-join dead code);
    tests/test_clustering.py asserts the anti-join excludes >0
    customers so the predicate can't silently go vacuous again."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thresh = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


Q22_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       {_ddsum_sql('c_acctbal')} AS total_acctbal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
GROUP BY c_mktsegment
"""


# --- Q4-style late-shipment priority check ----------------------------------

def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one lineitem shipped more than 60 days
    after the order date, counted by priority (TPC-H Q4 shape:
    correlated EXISTS → semi join with a non-equi date component;
    the fixture lacks commit/receipt dates, so lateness is shipdate
    vs orderdate + 60d)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_late_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


# --- monthly revenue with calendar gap-fill ---------------------------------

GAPFILL_PRICE_FLOOR = 480_000.0  # thin slice so zero-revenue months exist


def orders_monthly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue of very-large orders over a CONTINUOUS month
    calendar — missing months appear as explicit zero rows (the
    time-series resample/gap-fill shape: ``sequence`` + ``explode``
    builds the calendar scaffold, a left join + coalesce fills it).
    At small SFs the thin slice genuinely skips months (36 zero rows
    at sf0.001), which the tests assert; the calendar math is
    identical when the slice happens to be dense."""
    src = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > GAPFILL_PRICE_FLOOR
    )
    month = F.date_trunc("month", F.col("o_orderdate"))
    rev = src.groupBy(month.alias("month")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
        F.count("*").alias("n_orders"),
    )
    span = src.agg(F.min(month).alias("lo"), F.max(month).alias("hi"))
    cal = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))).alias("month")
    )
    return cal.join(rev, "month", "left").select(
        F.date_format("month", "yyyy-MM").alias("month"),
        F.coalesce(F.col("rev_dec").cast("double"), F.lit(0.0)).alias("revenue"),
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
    )


GAPFILL_SQL = f"""
WITH src AS (SELECT * FROM orders WHERE o_totalprice > {GAPFILL_PRICE_FLOOR}),
rev AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
         COUNT(*) AS n_orders
  FROM src GROUP BY 1
),
span AS (
  SELECT MIN(date_trunc('month', o_orderdate)) AS lo,
         MAX(date_trunc('month', o_orderdate)) AS hi
  FROM src
),
cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month FROM span)
SELECT strftime(cal.month, '%Y-%m') AS month,
       COALESCE(CAST(rev_dec AS DOUBLE), 0.0) AS revenue,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders
FROM cal LEFT JOIN rev USING (month)
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "q7_nation_trade_flows": (q7_nation_trade_flows, Q7_SQL),
    "q8_nation_market_share": (q8_nation_market_share, Q8_SQL),
    "q13_order_count_distribution": (q13_order_count_distribution, Q13_SQL),
    "q18_large_quantity_orders": (q18_large_quantity_orders, Q18_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
    "q22_idle_balance_by_segment": (q22_idle_balance_by_segment, Q22_SQL),
    "q4_late_shipment_priority": (q4_late_shipment_priority, Q4_SQL),
    "orders_monthly_gapfill": (orders_monthly_gapfill, GAPFILL_SQL),
}
