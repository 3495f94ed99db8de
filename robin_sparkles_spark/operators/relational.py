"""Relational operator surface over the fixture star schema
(SURVEY.md §7 Phase 2; EXT rows J3/A8/O4/§2.5/§2.7/F9 of the §2
inventory).

Every query here has a DuckDB oracle twin (the `*_SQL` string next to
it) and follows the registry's parity rules: identical aliases, exact
DECIMAL accumulation for anything summed (cast back to double at the
end), no raw timestamps in outputs, deterministic tie-breaks on every
top-k / argmax / window.

Scale design notes (100 TB):
- dimension joins (region/nation/customer/supplier/part) are
  explicitly ``F.broadcast`` — at TPC-H scale these stay several
  orders of magnitude below the fact tables, and broadcasting removes
  the fact-side shuffle entirely;
- fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE
  handles skew/coalescing (session defaults in session.py);
- aggregations are all partial+final hash aggregates (Catalyst
  default) — no query here collects more than its final result;
- filters sit directly on the scan columns so they push into the
  parquet reader (verified by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from ..sources import load_table


def _dsum(col: Column, scale: int = 2) -> Column:
    """Order-insensitive exact sum of a double column: accumulate as
    DECIMAL (exact, associative), return double. The per-row
    double→decimal cast is deterministic; only the *accumulation* was
    order-dependent."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def _ddsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


# --- Q1-style pricing summary (A1/A8; TPC-H Q1 shape) -----------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price, 4).alias("sum_disc_price"),
            _dsum(charge, 6).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (_dsum(F.col("l_discount"), 4) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_ddsum_sql('l_quantity')} AS sum_qty,
       {_ddsum_sql('l_extendedprice')} AS sum_base_price,
       {_ddsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
       {_ddsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       {_ddsum_sql('l_quantity')} / COUNT(*) AS avg_qty,
       {_ddsum_sql('l_extendedprice')} / COUNT(*) AS avg_price,
       {_ddsum_sql('l_discount', 4)} / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3-style shipping priority (J3 + O4) -----------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-01-01"))
    )
    # r15 (guide §3.2): the BUILDING filter keeps ~1/5 of customers,
    # so joining the broadcast dimension into orders BEFORE the
    # l ⋈ o shuffle cuts the orders-side shuffle bytes by that factor
    # at any scale (the lineitem side is already shipdate-filtered).
    # Project orders to the three surviving columns before the
    # exchange (guide §2.3). r16 (VERDICT r15 #4 cost-parity): the
    # broadcast ships ONLY the join key — the semi-join is all this
    # probe does, so the built hash relation is a fifth of the
    # customer columns narrower on both driver and executors.
    o = o.join(F.broadcast(c.select("c_custkey")), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       {_ddsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- Q5-style local-supplier revenue (J3: 6-way star join) ------------------

def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    l = load_table(spark, sf_dir, "lineitem")
    # r15 (guide §3.2): the ASIA region keeps 5 of 25 nations, so
    # pre-reducing BOTH fact sides with their broadcast dimensions
    # BEFORE the l ⋈ o shuffle cuts each side's shuffle bytes ~5× at
    # any scale. Joins and filters are the same inner-join set
    # reordered: c restricted to ASIA nations is implied by
    # c_nationkey == s_nationkey with s already ASIA-only, so no row
    # is lost or gained.
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    # r16 (VERDICT r15 #4 — keep the §3.2 pre-reduced shape, reach cost
    # parity at bench scale): each fact side probes ONE broadcast
    # instead of two. The ASIA dimension sets are assembled on the
    # broadcast side first (supplier/customer keyed into n_asia — tiny
    # joins of broadcast-sized inputs), both referencing the SAME
    # n_asia subtree so its exchange is built once and reused; the
    # fact scans then do a single hash probe per row, which also drops
    # non-ASIA rows at first touch. Probe columns pruned to the
    # survivors (guide §2.3: s loses 5 of 7 columns, c 6 of 8). Same
    # inner-join set reordered — no row lost or gained — and both
    # fact sides still shrink 5× before the l ⋈ o exchange.
    s_asia = (
        s.select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n_asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    c_asia = (
        c.select("c_custkey", "c_nationkey")
        .join(F.broadcast(n_asia), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
    )
    l = l.join(F.broadcast(s_asia), l.l_suppkey == F.col("s_suppkey")).select(
        "l_orderkey", "l_extendedprice", "l_discount", "s_nationkey", "n_name"
    )
    o = o.join(F.broadcast(c_asia), o.o_custkey == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # TPC-H Q5's "local supplier": customer and supplier share a nation
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


Q5_SQL = f"""
SELECT n_name,
       {_ddsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --- top-k (O4) -------------------------------------------------------------

def top_customers_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(_dsum(F.col("o_totalprice")).alias("total_spent"), F.count("*").alias("n_orders"))
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


TOP_CUSTOMERS_SQL = f"""
SELECT c_custkey, c_name,
       {_ddsum_sql('o_totalprice')} AS total_spent,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey ASC
LIMIT 10
"""


# --- rollup / cube (A8) -----------------------------------------------------

def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    return (
        o.rollup("o_year", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), _dsum(F.col("o_totalprice")).alias("total_price"))
        .select(
            F.coalesce(F.col("o_year").cast("string"), F.lit("ALL")).alias("year"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


ORDERS_ROLLUP_SQL = f"""
SELECT COALESCE(CAST(o_year AS VARCHAR), 'ALL') AS year,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       {_ddsum_sql('o_totalprice')} AS total_price
FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderpriority, o_totalprice FROM orders)
GROUP BY ROLLUP (o_year, o_orderpriority)
"""


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


ORDERS_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- windows (§2.5 EXT: ranking, lag, frames) -------------------------------

def window_top_order_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


WINDOW_TOP_ORDER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""


def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() + date arithmetic: days between a customer's consecutive
    orders (A6/J2's window-shaped logic exercised on fixtures)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        o.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .where(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate").cast("date"), F.col("prev_date").cast("date"))
            .cast("long")
            .alias("gap_days"),
        )
    )


WINDOW_ORDER_GAP_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day', CAST(prev_date AS DATE), CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_date
  FROM orders
) WHERE prev_date IS NOT NULL
"""


def window_running_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec running aggregate over events (rowsBetween) with an
    exact DECIMAL accumulator — per-user cumulative spend."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


WINDOW_RUNNING_SPEND_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM events
"""


def window_event_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.desc("value"))
    return e.select(
        "event_type",
        "event_id",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


WINDOW_EVENT_RANKS_SQL = """
SELECT event_type, event_id,
       CAST(RANK() OVER (PARTITION BY event_type ORDER BY value DESC) AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY event_type ORDER BY value DESC) AS BIGINT) AS drnk
FROM events
"""


# --- semi / anti joins (§2.7: the stop-word filter at scale) ----------------

def customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300_000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (§2.7 shape). The build side is pre-filtered to
    urgent orders: on this corpus every customer has SOME order, so an
    unfiltered anti-join is vacuously empty (r01's 0-row green row) —
    the priority slice keeps the query non-vacuous at every gate SF
    (18 / 203 / 1986 rows at sf0.001/0.01/0.1)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


# --- set operations (§2.7 EXT) ----------------------------------------------

def order_slices_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(high-value ∪ urgent) \\ finished — distinct set semantics in
    both engines (union/except, not unionAll/exceptAll)."""
    o = load_table(spark, sf_dir, "orders")
    high = o.where(F.col("o_totalprice") > 350_000).select("o_orderkey")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    finished = o.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    return high.union(urgent).distinct().exceptAll(finished.distinct())


SETOPS_SQL = """
(SELECT o_orderkey FROM orders WHERE o_totalprice > 350000
 UNION
 SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
EXCEPT
SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
"""


# --- scalar-function surface (F9: JSON, dates, arithmetic) ------------------

def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the events.props JSON string column."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count(k).alias("n_with_k"))
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       -- CAST: DuckDB SUM(BIGINT) yields HUGEINT (→ float in pandas),
       -- Spark yields LONG; align the types or the value-hash differs
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
FROM events
GROUP BY event_type
"""


def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc/formatting + min/max (exact on doubles — no
    accumulation-order dependence)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


ORDERS_BY_MONTH_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY 1
"""


def part_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + pushed filter + arithmetic projection (P-family on S9):
    the filter and 4-column read schema reach the parquet reader."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.where((F.col("p_size").between(10, 20)) & (F.col("p_brand") == "Brand#13"))
        .select(
            "p_partkey",
            "p_name",
            (F.col("p_retailprice") * 1.1).alias("marked_up"),
            (F.col("p_size") * F.lit(2)).cast("long").alias("double_size"),
        )
    )


PART_FILTER_SQL = """
SELECT p_partkey, p_name,
       p_retailprice * 1.1 AS marked_up,
       CAST(p_size * 2 AS BIGINT) AS double_size
FROM part
WHERE p_size BETWEEN 10 AND 20 AND p_brand = 'Brand#13'
"""


# --- distinct aggregates / argmax (A4, A5) ----------------------------------

def events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 parity shape: exact count-distinct per group (the tuner's
    numExecutors computation, ComputePartitions.scala:40, expressed on
    fixtures). approx_count_distinct is the documented 100 TB knob."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
        )
    )


EVENTS_USER_STATS_SQL = f"""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events,
       {_ddsum_sql('value')} AS total_value
FROM events
GROUP BY event_type
"""


def events_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 parity shape (maxBy): the top-value event per type, ties
    broken by event_id — window argmax, deterministic in both engines
    (a bare max_by leaves ties unspecified)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", "event_id", "value")
    )


EVENTS_ARGMAX_SQL = """
SELECT event_type, event_id, value
FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


# --- J1 parity shape: keyed join + per-key task aggregates ------------------

def order_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tuner's stage↔task join re-expressed on fixtures
    (Listener.scala:63-67 / SURVEY.md J1): parent keyed to children,
    per-parent count / sum / count-distinct. Inner join ⇒ parents with
    no children are dropped (the reference's effective semantics)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    per_order = (
        l.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items"),  # A3 shape
            _dsum(F.col("l_quantity")).alias("sum_qty"),  # A2 shape
            F.countDistinct("l_suppkey").alias("n_suppliers"),  # A4 shape
        )
    )
    return o.join(per_order, o.o_orderkey == per_order.l_orderkey, "inner").select(
        "o_orderkey", "o_orderstatus", "n_items", "sum_qty", "n_suppliers"
    )


ORDER_LINEITEM_ROLLUP_SQL = f"""
SELECT o_orderkey, o_orderstatus, n_items, sum_qty, n_suppliers
FROM orders
JOIN (
  SELECT l_orderkey,
         COUNT(*) AS n_items,
         {_ddsum_sql('l_quantity')} AS sum_qty,
         COUNT(DISTINCT l_suppkey) AS n_suppliers
  FROM lineitem GROUP BY l_orderkey
) ON o_orderkey = l_orderkey
"""


# --- dims broadcast join ----------------------------------------------------

def nation_region_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


NATION_REGION_SQL = """
SELECT n_nationkey, n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_region_revenue": (q5_region_revenue, Q5_SQL),
    "top_customers_revenue": (top_customers_revenue, TOP_CUSTOMERS_SQL),
    "orders_rollup": (orders_rollup, ORDERS_ROLLUP_SQL),
    "orders_cube": (orders_cube, ORDERS_CUBE_SQL),
    "window_top_order_per_cust": (window_top_order_per_cust, WINDOW_TOP_ORDER_SQL),
    "window_order_gap_days": (window_order_gap_days, WINDOW_ORDER_GAP_SQL),
    "window_running_user_spend": (window_running_user_spend, WINDOW_RUNNING_SPEND_SQL),
    "window_event_ranks": (window_event_ranks, WINDOW_EVENT_RANKS_SQL),
    "customers_with_big_orders": (customers_with_big_orders, SEMI_JOIN_SQL),
    "customers_without_urgent_orders": (customers_without_urgent_orders, ANTI_JOIN_SQL),
    "order_slices_setops": (order_slices_setops, SETOPS_SQL),
    "events_json_extract": (events_json_extract, EVENTS_JSON_SQL),
    "orders_by_month": (orders_by_month, ORDERS_BY_MONTH_SQL),
    "part_filter_projection": (part_filter_projection, PART_FILTER_SQL),
    "events_user_stats": (events_user_stats, EVENTS_USER_STATS_SQL),
    "events_argmax": (events_argmax, EVENTS_ARGMAX_SQL),
    "order_lineitem_rollup": (order_lineitem_rollup, ORDER_LINEITEM_ROLLUP_SQL),
    "nation_region_names": (nation_region_names, NATION_REGION_SQL),
}
