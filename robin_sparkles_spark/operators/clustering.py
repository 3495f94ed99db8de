"""Distributed k-means over the embeddings table + the IVF ANN search
it enables (EXT — the "IVF or LSH-bucketed variant" scale path from
the north star).

Iterative algorithm ⇒ genuinely non-SQL-expressible as one query, so
these register WITHOUT oracles (the driver records rows-only checks —
the documented contract for iterative ops). Tests pin the semantics:
assignment is argmin over centroids, iterations monotonically decrease
inertia, IVF results are a subset of brute-force with identical
scores for shared pairs.

Scale shape per iteration (the textbook Spark k-means):
- centroids live driver-side (k × dim doubles — tiny) and broadcast;
- assignment is a per-row argmin projection (no shuffle);
- re-estimation is one groupBy(cluster) partial+final aggregation of
  per-dimension sums (one shuffle of k × dim partial sums per
  partition, not of the data).
Fixed seed-free init (first k vec_ids) + fixed iteration count keep
row counts deterministic for the rows-only gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.vectors import as_double, dot
from ..sources import load_table

K_CLUSTERS = 8
N_ITER = 5
IVF_TOP_K = 5
IVF_N_QUERIES = 100


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )


def _assign_expr(centroids: list[list[float]]) -> F.Column:
    """argmin over squared distances to literal centroids — unrolled
    into a pure Column expression (k is small; the data side stays a
    single codegen-able projection). ‖v−c‖² = ‖v‖² − 2⟨v,c⟩ + ‖c‖²;
    ‖v‖² is cluster-invariant, so argmin needs only ⟨v,c⟩ and ‖c‖²."""
    best_idx = F.lit(0)
    best_score = None
    for i, c in enumerate(centroids):
        c_arr = F.array(*[F.lit(float(x)) for x in c])
        c_norm2 = float(sum(x * x for x in c))
        score = F.lit(c_norm2) - 2.0 * dot(F.col("v"), c_arr)
        if best_score is None:
            best_score = score
        else:
            best_idx = F.when(score < best_score, F.lit(i)).otherwise(best_idx)
            best_score = F.least(best_score, score)
    return best_idx


_FIT_CACHE: dict[tuple, list[list[float]]] = {}


def kmeans_fit(spark: SparkSession, sf_dir: str, k: int = K_CLUSTERS, n_iter: int = N_ITER) -> list[list[float]]:
    """Lloyd's iterations; returns the final centroids (driver-side
    k × dim list). Init: the first k vectors by vec_id (deterministic,
    no RNG). Memoized per (sf_dir, k, n_iter): both declared queries
    need the same fit, and re-running 5 iterations of Spark jobs for
    each would double the correctness gate's cost for no information."""
    key = (sf_dir, k, n_iter)
    if key in _FIT_CACHE:
        return _FIT_CACHE[key]
    vecs = _vectors(spark, sf_dir)
    dim = len(vecs.first().v)
    centroids = [r.v for r in vecs.orderBy("vec_id").limit(k).collect()]
    for _ in range(n_iter):
        assigned = vecs.withColumn("cluster", _assign_expr(centroids))
        sums = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[
                F.sum(F.element_at(F.col("v"), i + 1)).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        new_centroids = list(centroids)
        for row in sums.collect():
            new_centroids[row.cluster] = [row[f"s{i}"] / row.n for i in range(dim)]
        centroids = new_centroids
    _FIT_CACHE[key] = centroids
    return centroids


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final cluster assignment for every vector (rows-only check:
    exactly one row per vec_id)."""
    centroids = kmeans_fit(spark, sf_dir)
    return (
        _vectors(spark, sf_dir)
        .select("vec_id", _assign_expr(centroids).cast("long").alias("cluster"))
    )


def _probe_cells_expr(centroids: list[list[float]], nprobe: int) -> F.Column:
    """The ``nprobe`` nearest cells as an array — multi-probe IVF's
    recall knob. Pure Catalyst: an array of (score, cell) structs,
    ``array_sort`` (lexicographic: score first, cell breaks exact
    ties), slice, project the cell ids. k is small, so this is a
    constant-width per-row projection like ``_assign_expr``."""
    pairs = []
    for i, c in enumerate(centroids):
        c_arr = F.array(*[F.lit(float(x)) for x in c])
        c_norm2 = float(sum(x * x for x in c))
        score = F.lit(c_norm2) - 2.0 * dot(F.col("v"), c_arr)
        pairs.append(F.struct(score.alias("s"), F.lit(i).alias("c")))
    ranked = F.slice(F.array_sort(F.array(*pairs)), 1, nprobe)
    return F.transform(ranked, lambda p: p["c"])


IVF_NPROBE = 2


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: cluster the corpus with k-means, then search each
    query's top-k within its ``IVF_NPROBE`` nearest cells — the
    equi-join-on-cell shape (like sign-LSH, but with learned,
    data-adaptive buckets). Multi-probe is the standard recall lever:
    the query side explodes to nprobe (query, cell) rows, the corpus
    side stays single-cell, and the join output grows ∝ nprobe, not
    corpus size (measured recall@5 vs exact: 0.36 at nprobe=1 → 0.54
    at nprobe=2 on the sf0.01 fixture; tests assert monotonicity)."""
    return _ivf_topk(spark, sf_dir, IVF_NPROBE)


def _ivf_topk(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    centroids = kmeans_fit(spark, sf_dir)
    vecs = _vectors(spark, sf_dir).withColumn(
        "cluster", _assign_expr(centroids)
    )
    # materialize assignment through an aggregate barrier so the
    # argmin expression isn't re-evaluated inside the join
    vecs = vecs.groupBy("vec_id").agg(
        F.first("v").alias("v"), F.first("cluster").alias("cluster")
    )
    probes = (
        vecs.where(F.col("vec_id") < IVF_N_QUERIES)
        .withColumn("probe", F.explode(_probe_cells_expr(centroids, nprobe)))
        .groupBy("vec_id", "probe")  # barrier: probe cells computed once
        .agg(F.first("v").alias("v"))
    )
    q = probes.alias("q")
    c = vecs.alias("c")
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        q.join(
            c,
            (F.col("q.probe") == F.col("c.cluster"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            (
                dot(F.col("q.v"), F.col("c.v"))
                / (F.sqrt(dot(F.col("q.v"), F.col("q.v"))) * F.sqrt(dot(F.col("c.v"), F.col("c.v"))))
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


# Iterative (multi-job) algorithms: no single-SQL oracle exists; the
# driver records rows-only checks for these two (documented contract).
QUERIES = {
    "kmeans_assign": (kmeans_assign, None),
    "ann_ivf_topk": (ann_ivf_topk, None),
}
