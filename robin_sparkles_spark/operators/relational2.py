"""Second relational batch: pivot/unpivot, grouping sets, exact
quantiles, and an as-of join — rounding out the A8/F9/"common OLAP
patterns" surface (SURVEY.md §2 EXT rows; the as-of join is the
classic operator Spark lacks natively, composed from a window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources import load_table
from .relational import _dsum, _ddsum_sql

ORDER_STATUSES = ("F", "O", "P")


# --- pivot ------------------------------------------------------------------

def orders_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: one row per priority, one column per status
    (explicit value list — at scale an implicit pivot would scan once
    just to enumerate values)."""
    o = load_table(spark, sf_dir, "orders")
    df = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(ORDER_STATUSES))
        .count()
    )
    # pivot leaves null where a (priority, status) combo is absent
    return df.select(
        F.col("o_orderpriority").alias("priority"),
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in ORDER_STATUSES],
    )


ORDERS_PIVOT_SQL = f"""
SELECT o_orderpriority AS priority,
       {', '.join(f"COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = '{s}'), 0) AS n_{s}" for s in ORDER_STATUSES)}
FROM orders
GROUP BY o_orderpriority
"""


# --- unpivot (melt) ---------------------------------------------------------

def lineitem_unpivot_charges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot the lineitem price components into (measure, amount)
    rows — `unpivot`/`stack`, the inverse of pivot. Aggregated per
    measure so the output is small and exactly summable."""
    l = load_table(spark, sf_dir, "lineitem")
    melted = l.unpivot(
        ids=["l_orderkey"],
        values=["l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="amount",
    )
    return melted.groupBy("measure").agg(
        F.count("*").alias("n"),
        _dsum(F.col("amount"), 4).alias("total_amount"),
    )


LINEITEM_UNPIVOT_SQL = f"""
SELECT measure, COUNT(*) AS n, {_ddsum_sql('amount', 4)} AS total_amount
FROM (
  UNPIVOT (SELECT l_orderkey, l_extendedprice, l_discount, l_tax FROM lineitem)
  ON l_extendedprice, l_discount, l_tax
  INTO NAME measure VALUE amount
)
GROUP BY measure
"""


# --- grouping sets ----------------------------------------------------------

def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority)) — finer control
    than rollup/cube; one pass, two aggregation granularities."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("rs2_orders")
    return spark.sql(
        f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               {_ddsum_sql('o_totalprice')} AS total_price
        FROM rs2_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


ORDERS_GROUPING_SETS_SQL = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       {_ddsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


# --- exact quantiles --------------------------------------------------------

def orders_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles of order value per priority.
    Spark `percentile` and DuckDB `quantile_cont` share the
    linear-interpolation definition, so values match bit-for-bit.
    (At 100 TB the knob is `percentile_approx` / t-digest — documented
    accuracy trade, not oracle-checkable across engines.)"""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
    )


ORDERS_QUANTILES_SQL = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.75) AS p75
FROM orders
GROUP BY o_orderpriority
"""


# --- as-of join -------------------------------------------------------------

def orders_asof_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (Spark has no native one — composed per the classic
    union+window recipe): for each order, the most recent event of
    user ``o_custkey`` at or before the order date.

    Shape: tag both sides, union on the shared (key, time) axis, one
    window pass carrying the last event forward, keep the order rows.
    One shuffle on (key), no range-explosion — the scalable batch
    as-of; `pd.merge_asof` via applyInPandas is the per-group
    alternative when the window state would be wide."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.col("o_orderkey").alias("orderkey"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(1).alias("is_order"),
    )
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(None).cast("long").alias("orderkey"),
        "event_id",
        F.lit(0).alias("is_order"),
    )
    # events sort before orders at identical t (is_order ASC) so an
    # exactly-simultaneous event counts as "at or before"
    w = (
        W.partitionBy("k")
        .orderBy(F.asc("t"), F.asc("is_order"), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        o.unionByName(e)
        .withColumn("last_event_id", F.last("event_id", ignorenulls=True).over(w))
        .where(F.col("is_order") == 1)
        .select(
            F.col("k").alias("custkey"),
            "orderkey",
            "last_event_id",
        )
    )


# DuckDB has a native ASOF JOIN — the oracle uses it directly, which
# cross-validates the union+window composition against an independent
# implementation of as-of semantics. Events are deduped per
# (user, ts) keeping max event_id — the same winner the window's
# event_id tie-break picks — and ts is cast to µs TIMESTAMP because
# the Spark side compares at µs while raw DuckDB would compare at the
# parquet's ns precision.
ORDERS_ASOF_SQL = """
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS event_id
  FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)
)
SELECT o.o_custkey AS custkey,
       o.o_orderkey AS orderkey,
       e.event_id AS last_event_id
FROM orders o
ASOF LEFT JOIN e
  ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
"""


def orders_price_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-priority price profile: order values clamped at
    their group's exact interpolated p05/p95 (the robust-statistics
    move a pipeline applies before any mean-based quality score, so a
    handful of mega-orders can't drag the average). Reports the
    clamp counts next to raw vs winsorized means.

    Plan: one groupBy computes the p05/p95 fences (same
    `percentile`/`quantile_cont` parity as orders_price_quantiles),
    broadcast back onto the scan (the fence table is |groups| rows),
    clamp map-side, one final aggregation. Sums go through exact
    DECIMAL(18,2) partials (double accumulation order differs across
    partitions/engines); the winsorized mean DECOMPOSES into
    sum(unclamped) + n_low·p05 + n_high·p95 so no full-mantissa
    double is ever cast to a fractional decimal — that cast is not
    cross-engine stable (Java rounds the exact binary expansion,
    DuckDB rounds a scaled double; divergence measured in
    operators/stats.py), and an earlier draft that summed the clamped
    column at DECIMAL(38,10) also hit the 2^53 decimal→double
    double-rounding at sf0.1. The 2-decimal source prices cast
    exactly at scale 2; the fence multiplies are one rounding each in
    a fixed order."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    fences = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    clamped = o.join(F.broadcast(fences), "o_orderpriority")
    # The winsorized sum never casts a full-mantissa double to a
    # fractional decimal (the cross-engine cast hazard measured in
    # operators/stats.py): clamped rows take exactly TWO distinct
    # values per group (the fences), so the mean decomposes into the
    # exact-decimal sum of the UNclamped 2-decimal prices plus
    # count × fence — two double multiplies in a fixed order.
    agg = clamped.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_totalprice") < F.col("p05"), 1).otherwise(0))
        .alias("n_clamped_low"),
        F.sum(F.when(F.col("o_totalprice") > F.col("p95"), 1).otherwise(0))
        .alias("n_clamped_high"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_raw"),
        F.sum(
            F.when(
                (F.col("o_totalprice") >= F.col("p05"))
                & (F.col("o_totalprice") <= F.col("p95")),
                F.col("o_totalprice"),
            )
            .otherwise(F.lit(0.0))
            .cast("decimal(18,2)")
        )
        .cast("double")
        .alias("sum_unclamped"),
        F.first("p05").alias("p05"),
        F.first("p95").alias("p95"),
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        "n_clamped_low",
        "n_clamped_high",
        "mean_raw",
        (
            (
                F.col("sum_unclamped")
                + F.col("n_clamped_low").cast("double") * F.col("p05")
                + F.col("n_clamped_high").cast("double") * F.col("p95")
            )
            / F.col("n_orders").cast("double")
        ).alias("mean_winsorized"),
    )


ORDERS_WINSORIZED_SQL = """
WITH fences AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS p05,
         quantile_cont(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY 1
),
agg AS (
  SELECT o.o_orderpriority,
         COUNT(*) AS n_orders,
         CAST(SUM(CASE WHEN o.o_totalprice < f.p05 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clamped_low,
         CAST(SUM(CASE WHEN o.o_totalprice > f.p95 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clamped_high,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mean_raw,
         CAST(SUM(CAST(CASE WHEN o.o_totalprice >= f.p05
                             AND o.o_totalprice <= f.p95
                            THEN o.o_totalprice ELSE 0.0 END
                       AS DECIMAL(18,2))) AS DOUBLE) AS sum_unclamped,
         MAX(f.p05) AS p05,
         MAX(f.p95) AS p95
  FROM orders o JOIN fences f USING (o_orderpriority)
  GROUP BY 1
)
SELECT o_orderpriority, n_orders, n_clamped_low, n_clamped_high, mean_raw,
       (sum_unclamped
        + CAST(n_clamped_low AS DOUBLE) * p05
        + CAST(n_clamped_high AS DOUBLE) * p95)
         / CAST(n_orders AS DOUBLE) AS mean_winsorized
FROM agg
"""


QUERIES = {
    "orders_pivot_status": (orders_pivot_status, ORDERS_PIVOT_SQL),
    "lineitem_unpivot_charges": (lineitem_unpivot_charges, LINEITEM_UNPIVOT_SQL),
    "orders_grouping_sets": (orders_grouping_sets, ORDERS_GROUPING_SETS_SQL),
    "orders_price_quantiles": (orders_price_quantiles, ORDERS_QUANTILES_SQL),
    "orders_asof_last_event": (orders_asof_last_event, ORDERS_ASOF_SQL),
    "orders_price_winsorized": (orders_price_winsorized, ORDERS_WINSORIZED_SQL),
}
