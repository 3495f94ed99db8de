"""Third relational batch: correlated scalar subquery (TPC-H Q17
shape) and the array-function surface over embeddings (F9 EXT)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table
from .relational import _ddsum_sql


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from line items whose quantity is
    below 20% of their part's average — a correlated scalar subquery,
    which Catalyst de-correlates into an aggregate + join (the plan to
    want at scale; no per-row subquery execution exists in Spark).
    Expressed via spark.sql because the DataFrame API has no
    correlated-subquery construct."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("rs3_lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("rs3_part")
    return spark.sql(
        f"""
        SELECT {_ddsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
        FROM rs3_lineitem JOIN rs3_part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < (
            SELECT 0.2 * avg(l_quantity) FROM rs3_lineitem WHERE l_partkey = p_partkey
          )
        """
    )


# avg(double) in the subquery: the correlated aggregate feeds a
# COMPARISON (not the output), so last-ulp accumulation differences
# could only flip rows sitting exactly on the 0.2·avg boundary —
# quantities are integers ±, boundary collisions don't occur in the
# fixture. Output sums go through DECIMAL as usual.
Q17_SQL = f"""
SELECT {_ddsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


def embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface (F9): per-label stats over the embedding
    arrays — element extrema via array_max/transform, first-component
    aggregation, dimensionality check. All higher-order builtins."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    abs_max = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return (
        e.select(
            "label",
            F.size("embedding").alias("dim"),
            abs_max.alias("abs_max"),
            F.element_at(v, 1).alias("first_dim"),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.max("dim").cast("long").alias("dim"),
            F.max("abs_max").alias("max_abs_element"),
            F.sum(F.col("first_dim").cast("decimal(18,9)")).cast("double").alias("sum_first_dim"),
        )
    )


EMBEDDING_ARRAY_STATS_SQL = """
WITH per_vec AS (
  SELECT label,
         len(embedding) AS dim,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS abs_max,
         CAST(embedding[1] AS DOUBLE) AS first_dim
  FROM embeddings
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(MAX(dim) AS BIGINT) AS dim,
       MAX(abs_max) AS max_abs_element,
       CAST(SUM(CAST(first_dim AS DECIMAL(18,9))) AS DOUBLE) AS sum_first_dim
FROM per_vec
GROUP BY label
"""


def window_order_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics windows: ntile quartiles + percent_rank
    + cume_dist over order value per priority. A total order (price,
    orderkey) makes ntile deterministic; percent_rank/cume_dist are
    rational (rank arithmetic / row counts) — no float drift."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


WINDOW_ORDER_ANALYTICS_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


def part_string_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (F8/F9): regexp_extract, substring,
    upper, concat, levenshtein (identical DP algorithm both engines),
    LIKE-style filtering."""
    p = load_table(spark, sf_dir, "part")
    return p.where(F.col("p_type").like("%a%")).select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long").alias("brand_num"),
        F.upper(F.substring("p_name", 1, 4)).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.levenshtein("p_name", F.lit("standard part")).cast("long").alias("lev_dist"),
    )


PART_STRING_SQL = """
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT) AS brand_num,
       upper(substring(p_name, 1, 4)) AS name_prefix,
       concat_ws('/', p_brand, p_type) AS brand_type,
       CAST(levenshtein(p_name, 'standard part') AS BIGINT) AS lev_dist
FROM part
WHERE p_type LIKE '%a%'
"""


QUERIES = {
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "embedding_array_stats": (embedding_array_stats, EMBEDDING_ARRAY_STATS_SQL),
    "window_order_analytics": (window_order_analytics, WINDOW_ORDER_ANALYTICS_SQL),
    "part_string_features": (part_string_features, PART_STRING_SQL),
}
