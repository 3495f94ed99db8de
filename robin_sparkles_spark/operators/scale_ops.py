"""Operators that exist for the 100 TB story itself: bloom-filter
join pruning, multi-dimensional (z-order) layout quality, and
changelog latest-wins upsert — the three moves a large deployment
makes around storage and shuffle rather than inside a single query.

All three are fully declarative DataFrame plans with exact DuckDB
twins (determinism rules as registry.py; the bloom uses the
engine-portable affine hash family from functions.hashing, never the
engines' incompatible native hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.hashing import MERSENNE_P, affine_params, affine_sql
from ..sources import load_table

# --- bloom-filter join pruning --------------------------------------------

BLOOM_M = 8192  # bits
BLOOM_K = 3  # hash functions
BLOOM_SEGMENT = "BUILDING"  # the dim predicate whose keys seed the filter
_BLOOM_HASH_BASE = 11  # affine family offset (disjoint from sketch uses)


def _bloom_positions(key: F.Column) -> F.Column:
    """The BLOOM_K bit positions of a key, duplicates removed (a key
    whose hashes collide sets fewer bits; membership must then demand
    exactly the distinct positions)."""
    pos = []
    for i in range(BLOOM_K):
        a, b = affine_params(_BLOOM_HASH_BASE + i)
        pos.append(((key * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)) % F.lit(BLOOM_M))
    return F.array_distinct(F.array(*pos))


def _bloom_positions_sql(expr: str) -> str:
    terms = ", ".join(
        f"({affine_sql(expr, _BLOOM_HASH_BASE + i)}) % {BLOOM_M}"
        for i in range(BLOOM_K)
    )
    return f"list_distinct([{terms}])"


def orders_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, measured: seed a BLOOM_M-bit /
    BLOOM_K-hash filter from the custkeys of one market segment,
    prune orders through it, and report the pruning quality against
    the exact semi-join — pass counts, false positives (bloom has no
    false negatives), and the realized FP rate.

    Why this exists at 100 TB: a fact-side shuffle is the dominant
    cost of a selective dim join; a bloom built from the dim side and
    evaluated AT THE SCAN removes most non-matching fact rows before
    any exchange. Spark's own engine does this adaptively (runtime
    row-group bloom filters, `spark.sql.optimizer.runtime.bloomFilter
    .enabled`, and DPP for partition keys); this operator is the
    explicit, engine-portable, oracle-checkable form of the same
    plan, with the quality accounting a deployment tunes m/k by.

    Plan: dim side → ≤ BLOOM_M distinct set-bit positions (a tiny
    aggregate, broadcast); fact side explodes each key's ≤ BLOOM_K
    distinct positions (map-only fan-out), broadcast-joins the
    position set, and a key passes iff ALL its positions matched
    (count == its distinct-position count). The exact semi-join runs
    once for the accounting. Output: one summary row."""
    seg = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == BLOOM_SEGMENT)
        .select("c_custkey")
    )
    set_bits = (
        seg.select(F.explode(_bloom_positions(F.col("c_custkey"))).alias("pos"))
        .distinct()
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # materialize the position list once per row, then fan out — the
    # fact-side scan is the hot path, no reason to hash twice
    probes = orders.withColumn(
        "plist", _bloom_positions(F.col("o_custkey"))
    ).select(
        "o_orderkey",
        "o_custkey",
        F.explode("plist").alias("pos"),
        F.size("plist").alias("n_pos"),
    )
    bloom_pass = (
        probes.join(F.broadcast(set_bits), "pos")
        .groupBy("o_orderkey", "o_custkey", "n_pos")
        .agg(F.count("*").alias("n_hit"))
        .where(F.col("n_hit") == F.col("n_pos"))
        .select("o_orderkey", "o_custkey")
    )
    exact_pass = orders.join(F.broadcast(seg), orders.o_custkey == seg.c_custkey, "semi")
    stats = (
        orders.agg(F.count("*").alias("n_orders"))
        .crossJoin(F.broadcast(bloom_pass.agg(F.count("*").alias("bloom_pass"))))
        .crossJoin(F.broadcast(exact_pass.agg(F.count("*").alias("exact_pass"))))
    )
    return stats.select(
        "n_orders",
        "bloom_pass",
        "exact_pass",
        (F.col("bloom_pass") - F.col("exact_pass")).alias("false_positives"),
        (
            (F.col("bloom_pass") - F.col("exact_pass")).cast("double")
            / (F.col("n_orders") - F.col("exact_pass")).cast("double")
        ).alias("fp_rate"),
    )


ORDERS_BLOOM_SQL = f"""
WITH seg AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{BLOOM_SEGMENT}'
),
set_bits AS (
  SELECT DISTINCT unnest({_bloom_positions_sql('c_custkey')}) AS pos FROM seg
),
probes AS (
  SELECT o_orderkey, o_custkey, unnest(plist) AS pos, len(plist) AS n_pos
  FROM (SELECT o_orderkey, o_custkey,
               {_bloom_positions_sql('o_custkey')} AS plist
        FROM orders)
),
bloom_pass AS (
  SELECT o_orderkey
  FROM probes JOIN set_bits USING (pos)
  GROUP BY o_orderkey, o_custkey, n_pos
  HAVING COUNT(*) = n_pos
),
exact_pass AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM seg)
),
agg AS (
  SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
         (SELECT COUNT(*) FROM bloom_pass) AS bloom_pass,
         (SELECT COUNT(*) FROM exact_pass) AS exact_pass
)
SELECT n_orders, bloom_pass, exact_pass,
       bloom_pass - exact_pass AS false_positives,
       CAST(bloom_pass - exact_pass AS DOUBLE)
       / CAST(n_orders - exact_pass AS DOUBLE) AS fp_rate
FROM agg
"""


# --- z-order layout quality ------------------------------------------------

Z_BITS = 8  # low bits interleaved per dimension
Z_BUCKETS = 256  # files/row-groups the layout would write


def _zkey(x: F.Column, y: F.Column) -> F.Column:
    """16-bit Morton (z-order) interleave of the low Z_BITS of two
    key columns — plain div/mod integer arithmetic (no engine-native
    bit ops), identical in both dialects."""
    zx = x % F.lit(1 << Z_BITS)
    zy = y % F.lit(1 << Z_BITS)
    z = F.lit(0)
    for i in range(Z_BITS):
        bit_x = (zx / F.lit(1 << i)).cast("long") % 2
        bit_y = (zy / F.lit(1 << i)).cast("long") % 2
        z = z + bit_x * F.lit(1 << (2 * i)) + bit_y * F.lit(1 << (2 * i + 1))
    return z


def _zkey_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x}) % {1 << Z_BITS}) // {1 << i}) % 2 * {1 << (2 * i)}")
        terms.append(f"((({y}) % {1 << Z_BITS}) // {1 << i}) % 2 * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def lineitem_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout quality for a 2-dimensional
    access pattern: interleave the low bits of (l_partkey,
    l_suppkey), split the curve into Z_BUCKETS equal key ranges (the
    files a z-ordered write would produce), and report each bucket's
    min/max per dimension plus the covered rectangle area — the
    min/max-statistics footprint a scan on EITHER dimension must
    read.

    Why this exists at 100 TB: sorting by one key clusters one
    predicate and destroys the other; the z-curve bounds BOTH
    dimensions' min/max spans per file, which is what makes parquet
    row-group / file skipping work for two-dimensional filters
    (Delta/Iceberg `OPTIMIZE ZORDER BY` is this exact layout). The
    stats this query emits are the acceptance metric for such a
    rewrite: tight per-bucket rectangles = effective skipping.

    Plan: map-only z-key projection, one groupBy(bucket) — a single
    shuffle of Z_BUCKETS×stats, nothing else."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    z = _zkey(F.col("l_partkey"), F.col("l_suppkey"))
    # bucket = z div (z_range / Z_BUCKETS) — explicit floor division:
    # Spark's double→long cast truncates but DuckDB's CAST rounds, so
    # neither side may go through a fractional intermediate.
    bucketed = li.select(
        F.floor(z / F.lit((1 << (2 * Z_BITS)) // Z_BUCKETS)).cast("long").alias("bucket"),
        (F.col("l_partkey") % F.lit(1 << Z_BITS)).alias("px"),
        (F.col("l_suppkey") % F.lit(1 << Z_BITS)).alias("py"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("px").alias("min_part"),
            F.max("px").alias("max_part"),
            F.min("py").alias("min_supp"),
            F.max("py").alias("max_supp"),
        )
        .select(
            "bucket",
            "n_rows",
            "min_part",
            "max_part",
            "min_supp",
            "max_supp",
            (
                (F.col("max_part") - F.col("min_part") + 1)
                * (F.col("max_supp") - F.col("min_supp") + 1)
            ).alias("rect_area"),
        )
    )


LINEITEM_ZORDER_SQL = f"""
WITH z AS (
  SELECT ({_zkey_sql('l_partkey', 'l_suppkey')}) AS zkey,
         l_partkey % {1 << Z_BITS} AS px,
         l_suppkey % {1 << Z_BITS} AS py
  FROM lineitem
)
SELECT CAST(zkey // {(1 << (2 * Z_BITS)) // Z_BUCKETS} AS BIGINT) AS bucket,
       COUNT(*) AS n_rows,
       MIN(px) AS min_part, MAX(px) AS max_part,
       MIN(py) AS min_supp, MAX(py) AS max_supp,
       (MAX(px) - MIN(px) + 1) * (MAX(py) - MIN(py) + 1) AS rect_area
FROM z GROUP BY 1
"""


# --- changelog latest-wins upsert -----------------------------------------

UPSERT_MOD = 7  # orderkeys receiving a v2 change record
UPSERT_DELTA = 10.0  # exact double increment (no rounding ambiguity)


def orders_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog apply (the MERGE INTO / CDC-compaction shape): a
    deterministic v2 change stream touches every UPSERT_MOD-th order
    (price +UPSERT_DELTA, status → 'U'); base ∪ changes resolves
    latest-wins per key, and the query reports the merged table's
    per-status profile — row count and an exact-decimal price sum.

    Plan: union (no shuffle) → per-key latest via max_by on the
    version (ONE hash aggregation — not the row_number-over-window
    form, which would sort; max_by's binary merge is
    order-insensitive and O(1) state). This is how a lakehouse MERGE
    compacts a day of CDC at 100 TB: shuffle once on the key, keep
    max-version, rewrite. Deletes would be a tombstone flag filtered
    after the same aggregation.
    """
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(1).alias("version"),
    )
    changes = (
        base.where(F.col("o_orderkey") % UPSERT_MOD == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + UPSERT_DELTA).alias("o_totalprice"),
            F.lit(2).alias("version"),
        )
    )
    merged = (
        base.unionByName(changes)
        .groupBy("o_orderkey")
        .agg(
            F.max_by("o_orderstatus", "version").alias("o_orderstatus"),
            F.max_by("o_totalprice", "version").alias("o_totalprice"),
        )
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


ORDERS_UPSERT_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version FROM orders
),
changes AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         o_totalprice + {UPSERT_DELTA!r} AS o_totalprice, 2 AS version
  FROM orders WHERE o_orderkey % {UPSERT_MOD} = 0
),
merged AS (
  SELECT o_orderkey,
         arg_max(o_orderstatus, version) AS o_orderstatus,
         arg_max(o_totalprice, version) AS o_totalprice
  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)
  GROUP BY o_orderkey
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM merged GROUP BY o_orderstatus
"""


# --- CDC apply with tombstones (r9) -----------------------------------------

DELETE_MOD = 11  # orderkeys receiving a v3 delete tombstone


def orders_cdc_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full CDC-apply shape `orders_upsert_latest`'s docstring
    only described: a three-version changelog (v1 insert, v2 update
    every UPSERT_MOD-th key, v3 DELETE tombstone every DELETE_MOD-th)
    resolved latest-wins per key by the SAME single max_by hash
    aggregation, with tombstoned keys surfacing as a 'D' status row
    (zero price mass) instead of vanishing silently — the audit view
    a changelog compaction reports. Mirrors the streaming
    ``streaming/cdc.py`` apply (its latest-wins fold carries the same
    tombstone flag); one shuffle on the key, no window, no sort."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(1).alias("version"),
        F.lit(False).alias("deleted"),
    )
    updates = base.where(F.col("o_orderkey") % UPSERT_MOD == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + UPSERT_DELTA).alias("o_totalprice"),
        F.lit(2).alias("version"),
        F.lit(False).alias("deleted"),
    )
    deletes = base.where(F.col("o_orderkey") % DELETE_MOD == 0).select(
        "o_orderkey",
        F.lit("D").alias("o_orderstatus"),
        F.lit(0.0).alias("o_totalprice"),
        F.lit(3).alias("version"),
        F.lit(True).alias("deleted"),
    )
    merged = (
        base.unionByName(updates)
        .unionByName(deletes)
        .groupBy("o_orderkey")
        .agg(
            F.max_by("o_orderstatus", "version").alias("o_orderstatus"),
            F.max_by("o_totalprice", "version").alias("o_totalprice"),
            F.max_by("deleted", "version").alias("deleted"),
        )
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(
            F.when(F.col("deleted"), F.lit(0.0))
            .otherwise(F.col("o_totalprice"))
            .cast("decimal(18,2)")
        )
        .cast("double")
        .alias("total_price"),
    )


ORDERS_CDC_TOMBSTONES_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         1 AS version, FALSE AS deleted
  FROM orders
),
updates AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         o_totalprice + {UPSERT_DELTA!r} AS o_totalprice,
         2 AS version, FALSE AS deleted
  FROM orders WHERE o_orderkey % {UPSERT_MOD} = 0
),
deletes AS (
  SELECT o_orderkey, 'D' AS o_orderstatus,
         0.0 AS o_totalprice, 3 AS version, TRUE AS deleted
  FROM orders WHERE o_orderkey % {DELETE_MOD} = 0
),
merged AS (
  SELECT o_orderkey,
         arg_max(o_orderstatus, version) AS o_orderstatus,
         arg_max(o_totalprice, version) AS o_totalprice,
         arg_max(deleted, version) AS deleted
  FROM (SELECT * FROM base
        UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM deletes)
  GROUP BY o_orderkey
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(CASE WHEN deleted THEN 0.0 ELSE o_totalprice END
                     AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM merged GROUP BY o_orderstatus
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "orders_bloom_prune": (orders_bloom_prune, ORDERS_BLOOM_SQL),
    "lineitem_zorder_stats": (lineitem_zorder_stats, LINEITEM_ZORDER_SQL),
    "orders_upsert_latest": (orders_upsert_latest, ORDERS_UPSERT_SQL),
    "orders_cdc_tombstones": (orders_cdc_tombstones, ORDERS_CDC_TOMBSTONES_SQL),
}
