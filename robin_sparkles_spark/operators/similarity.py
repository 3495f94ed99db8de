"""Similarity search over the embeddings table (EXT — BASELINE.json
north star): brute-force cosine top-k as the correctness baseline, and
a sign-LSH-bucketed variant as the scale path.

Both are oracle-checked: similarity values are bit-exact across
engines (functions.vectors determinism contract) and every top-k has a
total tie-break, so even the quadratic baseline hash-matches DuckDB.

Scale design (100 TB):
- vectors are unit-normalized ONCE, behind an aggregation barrier
  (groupBy(vec_id)) — without the barrier Catalyst collapses the
  normalization into the join and re-evaluates norms per PAIR
  (measured 4.2 s → ~1 s at sf0.1 even at this tiny scale); after it,
  each pair costs exactly one 64-wide dot product, and cosine ==
  normalized dot;
- brute-force is O(Q·N): broadcast the Q query vectors, stream the N
  corpus rows — correct but quadratic; keep Q small or use as the
  within-bucket re-rank stage;
- sign-LSH buckets both sides by the sign pattern of the leading
  dimensions — the join becomes an equi-join on the bucket key
  (shuffle, linear), and only within-bucket pairs pay the dot product;
  the standard recall/cost trade (more bits → smaller buckets, lower
  recall). An IVF upgrade (k-means centroids as buckets) drops in by
  replacing the bucket expression with an argmin-over-centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.vectors import as_double, dot, dot_sql, normalized, normalized_sql
from ..sources import load_table

TOP_K = 5
N_QUERIES = 100  # query set: vec_id < 100
SIGN_BITS = 8  # LSH bucket = sign pattern of the first 8 dims


def _unit_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id → unit-normalized double vector, materialized through a
    groupBy barrier (see module docstring — this is what keeps the
    pair scans linear in per-pair cost)."""
    vn = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", normalized(as_double(F.col("embedding"))).alias("vn"))
    )
    return vn.groupBy("vec_id").agg(F.first("vn").alias("v"))


_UNIT_VECTORS_SQL = f"""
  SELECT vec_id, {normalized_sql('v')} AS v
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
"""


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: for each query vector (vec_id < N_QUERIES),
    the K nearest corpus vectors. Ties broken by neighbor id."""
    vecs = _unit_vectors(spark, sf_dir)
    q = vecs.where(F.col("vec_id") < N_QUERIES).alias("q")
    c = vecs.alias("c")
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            dot(F.col("q.v"), F.col("c.v")).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


ANN_BRUTEFORCE_SQL = f"""
WITH e AS ({_UNIT_VECTORS_SQL}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {dot_sql('q.v', 'c.v')} AS cos_sim
  FROM e q JOIN e c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {TOP_K}
"""


def _bucket_expr_spark() -> F.Column:
    """Sign-pattern bucket: bit i = 1 iff v[i] > 0, first SIGN_BITS
    dims, packed msb-first via acc*2+bit (pure arithmetic — identical
    in the SQL twin). Sign is normalization-invariant, so bucketing
    the unit vectors matches bucketing the raw ones."""
    return F.expr(
        f"""
        aggregate(slice(v, 1, {SIGN_BITS}), CAST(0 AS BIGINT),
                  (acc, x) -> acc * 2 + (CASE WHEN x > 0 THEN 1 ELSE 0 END))
        """
    )


_BUCKET_SQL = f"""
  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
      list_slice(v, 1, {SIGN_BITS}), x -> CAST(CASE WHEN x > 0 THEN 1 ELSE 0 END AS BIGINT))),
    (acc, b) -> acc * 2 + b)
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH approximate top-k: equi-join on the sign bucket, exact
    cosine + rank within bucket only. Linear shuffle instead of a
    quadratic pair scan — the 100 TB shape."""
    vecs = _unit_vectors(spark, sf_dir).withColumn("bucket", _bucket_expr_spark())
    q = vecs.where(F.col("vec_id") < N_QUERIES).alias("q")
    c = vecs.alias("c")
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        q.join(
            c,
            (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            dot(F.col("q.v"), F.col("c.v")).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


ANN_LSH_SQL = f"""
WITH e0 AS ({_UNIT_VECTORS_SQL}),
e AS (SELECT vec_id, v, {_BUCKET_SQL} AS bucket FROM e0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {dot_sql('q.v', 'c.v')} AS cos_sim
  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {TOP_K}
"""


QUERIES = {
    "ann_bruteforce_topk": (ann_bruteforce_topk, ANN_BRUTEFORCE_SQL),
    "ann_lsh_topk": (ann_lsh_topk, ANN_LSH_SQL),
}
