"""Round-4 TPC-H-shaped additions (EXT — public TPC-H spec adapted to
the fixture's columns; the missing partsupp table / commit+receipt
dates are substituted as documented per query, keeping each spec
query's JOIN/AGGREGATE SHAPE even where a spec column is absent).

Determinism rules as registry.py: decimal accumulation for every
double sum; max/argmax computed over exact decimals; total orderings
on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources import load_table
from .relational4 import REVENUE_SQL, _revenue

# Q9's cost proxy: no partsupp.ps_supplycost in the fixture, so unit
# cost is modeled as 60% of the part's retail price — an arbitrary but
# deterministic constant that keeps Q9's profit = revenue − cost shape.
COST_FACTOR = "0.6"
Q15_QTR_START, Q15_QTR_END = "1996-01-01", "1996-04-01"
Q21_LATE_DAYS = 75
Q21_TOP_N = 20


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) adapted: profit per (supplier
    nation, order year) over parts whose name contains 'e', with
    cost = 0.6·p_retailprice·l_quantity standing in for the missing
    ps_supplycost·l_quantity. Shape preserved: 5-table join
    (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders), filter pushed to
    the part scan, profit accumulated in exact DECIMAL. Dimension
    sides broadcast — at 100 TB only lineitem and orders are big, and
    they equi-join on l_orderkey."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("e"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(float(COST_FACTOR)) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).alias("profit_dec"))
        .select("nation", "o_year", F.col("profit_dec").cast("double").alias("profit"))
    )


Q9_SQL = f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - {COST_FACTOR} * p.p_retailprice * l.l_quantity
                AS DECIMAL(18,4))) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%e%'
GROUP BY n.n_name, year(o.o_orderdate)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): revenue per supplier over one quarter
    of shipments, returning the supplier(s) achieving the maximum —
    the spec's revenue view + scalar-max + join-back, with the max
    taken over the exact DECIMAL totals so tie semantics are
    bit-portable. The max is a 1-row broadcast equi-join (not a
    nested loop): at any scale the revenue view is |suppliers| rows."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.where(
            (F.col("l_shipdate") >= F.lit(Q15_QTR_START))
            & (F.col("l_shipdate") < F.lit(Q15_QTR_END))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("total_dec"))
    )
    mx = rev.agg(F.max("total_dec").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_dec") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("total_dec").cast("double").alias("total_revenue"),
        )
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({REVENUE_SQL}) AS total_dec
  FROM lineitem
  WHERE l_shipdate >= '{Q15_QTR_START}' AND l_shipdate < '{Q15_QTR_END}'
  GROUP BY l_suppkey
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       CAST(rev.total_dec AS DOUBLE) AS total_revenue
FROM rev
JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE rev.total_dec = (SELECT MAX(total_dec) FROM rev)
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) adapted:
    "late" = shipped more than {Q21_LATE_DAYS} days after the order
    date (the fixture has no commit/receipt dates), and the spec's
    correlated EXISTS / NOT EXISTS pair — another supplier
    participated in the order / no OTHER supplier was late — is
    expressed as per-order supplier counts: a (order, supplier) grain
    aggregate, then per-order distinct-supplier and late-supplier
    counts, then the blame filter n_supp ≥ 2 AND n_late_supp = 1 AND
    this supplier late. Pure aggregates — two shuffles (orderkey,
    suppkey), no correlated re-scan per row, which is exactly how the
    EXISTS pair should compile at 100 TB."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    per_os = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.date_add(F.col("o_orderdate"), Q21_LATE_DAYS)
                ).cast("int")
            ).alias("late")
        )
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("late").alias("n_late_supp")
    )
    blamed = (
        per_os.where(F.col("late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    counts = blamed.groupBy("l_suppkey").agg(F.count("*").alias("numwait"))
    w = W.orderBy(F.desc("numwait"), F.asc("s_name"))
    return (
        counts.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= Q21_TOP_N)
        .select("s_name", "numwait", F.col("rk").cast("long").alias("rk"))
    )


Q21_SQL = f"""
WITH per_os AS (
  SELECT l.l_orderkey, l.l_suppkey,
         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey, l.l_suppkey
),
per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late_supp
  FROM per_os GROUP BY l_orderkey
),
counts AS (
  SELECT p.l_suppkey, COUNT(*) AS numwait
  FROM per_os p JOIN per_order q ON p.l_orderkey = q.l_orderkey
  WHERE p.late = 1 AND q.n_supp >= 2 AND q.n_late_supp = 1
  GROUP BY p.l_suppkey
),
ranked AS (
  SELECT s.s_name, c.numwait,
         ROW_NUMBER() OVER (ORDER BY c.numwait DESC, s.s_name ASC) AS rk
  FROM counts c JOIN supplier s ON c.l_suppkey = s.s_suppkey
)
SELECT s_name, CAST(numwait AS BIGINT) AS numwait, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {Q21_TOP_N}
"""


OVERLAP_WINDOW_DAYS = 30


def orders_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-overlap join without a nested loop — the range-
    join pattern Spark lacks natively: per customer, count pairs of
    orders whose {OVERLAP_WINDOW_DAYS}-day activity windows
    [orderdate, orderdate+{OVERLAP_WINDOW_DAYS}d) overlap.

    A naive interval join compiles to a BroadcastNestedLoopJoin (the
    per-row O(N²) trap); the scale shape is BIN BLOCKING: explode each
    interval into the calendar months it covers, equi-join on
    (custkey, month) — any two overlapping intervals share the month
    of any overlap instant, so the blocking is exhaustive — then
    verify true overlap on candidates and dedupe pairs that share
    several months. Candidates ∝ per-(customer, month) density², not
    corpus²; the month is the granularity/selectivity knob (days for
    dense keys). Same blocked-equi-join discipline as the LSH/pigeon-
    hole dedup plans, applied to time ranges."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("start"),
        F.date_add(F.col("o_orderdate"), OVERLAP_WINDOW_DAYS).alias("end"),
    )
    binned = o.withColumn(
        "m",
        F.explode(
            F.sequence(
                F.trunc(F.col("start"), "month"),
                # end is EXCLUSIVE: an interval ending exactly on a
                # month boundary does not cover that month
                F.trunc(F.date_sub(F.col("end"), 1), "month"),
                F.expr("interval 1 month"),
            )
        ),
    )
    a = binned.alias("a")
    b = binned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.m") == F.col("b.m"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .where(
            (F.col("a.start") < F.col("b.end")) & (F.col("b.start") < F.col("a.end"))
        )
        .select(
            F.col("a.o_custkey").alias("c_custkey"),
            F.col("a.o_orderkey").alias("k1"),
            F.col("b.o_orderkey").alias("k2"),
        )
        .distinct()
    )
    return pairs.groupBy("c_custkey").agg(F.count("*").alias("n_overlapping_pairs"))


# Oracle: the straightforward non-equi self-join — DuckDB's optimizer
# handles the quadratic form at gate scale; the Spark side must match
# it through the binned plan (blocking exhaustiveness is what's being
# hash-checked).
ORDERS_OVERLAP_SQL = f"""
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate AS s,
         o_orderdate + INTERVAL {OVERLAP_WINDOW_DAYS} DAY AS e
  FROM orders
)
SELECT a.o_custkey AS c_custkey, COUNT(*) AS n_overlapping_pairs
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
 AND a.s < b.e AND b.s < a.e
GROUP BY a.o_custkey
"""


ANOMALY_Z = 3.0
ANOMALY_WINDOW_S = 86400  # trailing 24 h (events are ~14/h/type)
ANOMALY_MIN_N = 50
ANOMALY_SPIKE_MOD = 997  # every 997th event_id gets a planted spike
ANOMALY_SPIKE = 500.0  # ≈ 3.5 σ over the uniform[0,490] background


def events_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection per event_type: each event
    scored against the trailing 24-hour window's mean/std (RANGE frame
    over event time, so equal timestamps are peers in both engines),
    flagging |z| > {ANOMALY_Z} with ≥ {ANOMALY_MIN_N} samples — the
    streaming-monitoring shape expressed as a batch window.

    The fixture's value distribution is right-skewed (mean ≈ 50, max
    ≈ 490), so the heavy tail yields ORGANIC z > 3 events — the normal
    operation of an anomaly detector on a skewed metric. The query
    additionally plants deterministic spikes (+{ANOMALY_SPIKE} on
    every {ANOMALY_SPIKE_MOD}th event_id, mirrored in the oracle) as
    known-positive anchors the pytest can assert on (measured at
    sf0.01: 10 planted flags at z 5.6–7.0 over 163 organic tail flags
    at z 3.0–6.0).

    Oracle determinism: Σx and Σx² accumulate as DECIMAL (order-
    independent); mean/var/std/z then follow the identical double-op
    sequence in both engines (sqrt is IEEE-correctly-rounded), so the
    z-scores hash-match bit-for-bit. The frame orders by FLOOR EPOCH
    SECONDS on both sides — Spark's range frame needs a numeric key
    (ts.cast long = floor seconds), and a sub-second oracle frame
    (ORDER BY raw ts) measurably diverges in window membership on the
    µs-resolution fixture timestamps (review r4: 13 flagged rows
    differed at sf0.1 with the mismatched frames)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v",
        F.col("value")
        + F.when(F.col("event_id") % ANOMALY_SPIKE_MOD == 0, F.lit(ANOMALY_SPIKE))
        .otherwise(F.lit(0.0)),
    )
    # The trailing-24h sums are computed as the DIFFERENCE of two
    # GROWING range frames (unbounded-preceding → now, minus
    # unbounded-preceding → window-start-exclusive) rather than one
    # bounded frame: Spark evaluates a bounded RANGE frame by
    # re-summing the whole frame per row — O(rows × frame), measured
    # 34 s at sf0.1 — while growing frames are incremental, O(rows),
    # measured ~3 s. The cumulative sums are down-cast to DECIMAL(30,s)
    # BEFORE the subtraction: without that, Spark types
    # DECIMAL(38,8) − DECIMAL(38,8) as DECIMAL(38,7) — precision would
    # exceed 38, so the result SCALE silently drops a digit (an r5
    # review verified 1e-8 − 0 → 0.0000000 empirically). At (30,s) the
    # difference types as DECIMAL(31,s): full scale kept, arithmetic
    # exact, cum_now − cum_before bit-identical to the direct frame sum
    # (the oracle keeps the direct bounded-frame spec, independently
    # checking the prefix-difference identity). The (30,s) cap bounds
    # the CUMULATIVE per-partition sum at 10^22 unscaled — Σv ~1e10 and
    # Σv² ~1e13 per event_type even at sf1, orders of magnitude inside.
    t = F.col("ts").cast("long")
    w_now = (
        W.partitionBy("event_type")
        .orderBy(t)
        .rangeBetween(W.unboundedPreceding, 0)
    )
    w_before = (
        W.partitionBy("event_type")
        .orderBy(t)
        .rangeBetween(W.unboundedPreceding, -(ANOMALY_WINDOW_S + 1))
    )
    # Scale bound (ADVICE r4): the decimal→double cast stays single-
    # rounding only while the UNSCALED sum < 2^53. With v ≤ ~990 and
    # window counts growing ~linearly in SF (~3.4k events/window at
    # sf1), Σx² ≈ 3.3e9 — at scale 6 the unscaled value is 3.3e15
    # < 2^53 through ~sf2, where scale 8 would overflow at sf1. Σx
    # (~3.4e6) keeps scale 8 safe to ~sf80. (The bound applies to the
    # post-subtraction WINDOW sum that is cast to double.)
    zero8 = F.lit(0).cast("decimal(30,8)")
    zero6 = F.lit(0).cast("decimal(30,6)")
    vdec = F.col("v").cast("decimal(38,8)")
    vvdec = (F.col("v") * F.col("v")).cast("decimal(38,6)")
    sx = (
        F.sum(vdec).over(w_now).cast("decimal(30,8)")
        - F.coalesce(F.sum(vdec).over(w_before).cast("decimal(30,8)"), zero8)
    ).cast("double")
    sxx = (
        F.sum(vvdec).over(w_now).cast("decimal(30,6)")
        - F.coalesce(F.sum(vvdec).over(w_before).cast("decimal(30,6)"), zero6)
    ).cast("double")
    n = F.count("*").over(w_now) - F.count("*").over(w_before)
    mean = sx / n
    var = sxx / n - mean * mean
    std = F.sqrt(var)
    z = (F.col("v") - mean) / std
    return (
        ev.select(
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
            F.col("v").alias("value"),
            n.alias("n_window"),
            z.alias("zscore"),
        )
        .where(
            (F.col("n_window") >= ANOMALY_MIN_N)
            & (F.abs(F.col("zscore")) > ANOMALY_Z)
        )
    )


EVENTS_ANOMALY_SQL = f"""
WITH inj AS (
  SELECT event_id, event_type, ts,
         value + CASE WHEN event_id % {ANOMALY_SPIKE_MOD} = 0
                      THEN {ANOMALY_SPIKE} ELSE 0.0 END AS v
  FROM events
),
scored AS (
  SELECT event_id, event_type,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
         v,
         COUNT(*) OVER w AS n_window,
         (v - CAST(SUM(CAST(v AS DECIMAL(38,8))) OVER w AS DOUBLE) / COUNT(*) OVER w)
           / sqrt(CAST(SUM(CAST(v * v AS DECIMAL(38,6))) OVER w AS DOUBLE) / COUNT(*) OVER w
                  - (CAST(SUM(CAST(v AS DECIMAL(38,8))) OVER w AS DOUBLE) / COUNT(*) OVER w)
                    * (CAST(SUM(CAST(v AS DECIMAL(38,8))) OVER w AS DOUBLE) / COUNT(*) OVER w)) AS zscore
  FROM inj
  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts) // 1000000
               RANGE BETWEEN {ANOMALY_WINDOW_S} PRECEDING AND CURRENT ROW)
)
SELECT event_id, event_type, ts_str, v AS value, n_window, zscore
FROM scored
WHERE n_window >= {ANOMALY_MIN_N} AND abs(zscore) > {ANOMALY_Z}
"""


def nation_coverage_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation — the join type's canonical use:
    compare two independently-derived per-nation summaries (customer
    count vs supplier count) and surface nations present in either
    side, with 0-sentinels where a side is missing (the supplier dim
    covers few nations, so NULL sides genuinely occur at every SF).
    Sentinels instead of NULLs for oracle hashability, as throughout."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), "n_name"
    )
    return (
        c.join(s, "nationkey", "full")
        .join(F.broadcast(n), "nationkey")
        .select(
            "n_name",
            F.coalesce(F.col("n_customers"), F.lit(0)).cast("long").alias("n_customers"),
            F.coalesce(F.col("n_suppliers"), F.lit(0)).cast("long").alias("n_suppliers"),
        )
    )


NATION_RECON_SQL = """
WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
           FROM customer GROUP BY c_nationkey),
s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey)
SELECT n.n_name,
       CAST(COALESCE(c.n_customers, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(s.n_suppliers, 0) AS BIGINT) AS n_suppliers
FROM c FULL JOIN s USING (nationkey)
JOIN nation n ON COALESCE(c.nationkey, s.nationkey) = n.n_nationkey
"""


QUERIES: dict = {}

# Post-gate-cap additions (registry.py QUERIES_TAIL contract); hard
# signal = the parametrized local oracle sweep in tests.
QUERIES_TAIL = {
    "q9_profit_by_nation_year": (q9_profit_by_nation_year, Q9_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
    "orders_overlap_pairs": (orders_overlap_pairs, ORDERS_OVERLAP_SQL),
    "events_rolling_anomaly": (events_rolling_anomaly, EVENTS_ANOMALY_SQL),
    "nation_coverage_recon": (nation_coverage_recon, NATION_RECON_SQL),
}
