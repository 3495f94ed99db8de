"""SemDeDup — semantic deduplication via cluster-then-pair-scan
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): k-means-cluster the embedding
corpus, compute exact pairwise cosine ONLY within each cluster, and
drop every vector that has a higher-similarity twin with a lower id.

This is the third blocking strategy in the embedding-dedup family —
LSH bands (``embedding_dedup``), IVF cells (``ann_ivf_topk``), and
now LEARNED clusters — and the one the SemDeDup paper argues scales
to web corpora: k grows with the corpus so cluster sizes stay
bounded, and the within-cluster pair scan is embarrassingly parallel
per cell. Blocking recall < 1 by construction (a dup pair split
across a cluster boundary is missed); the pytest measures recall
against the planted pairs and the oracle mirrors the SAME
cluster-blocked semantics, so the hash gate checks what the operator
claims, not an unattainable exact scan.

Corpus: the staged planted-near-dup table from
``operators.embedding_dedup`` (the organic fixture has no dups — max
organic cosine ≈ 0.51 — so a real 0.9 threshold needs the plant).
Centroids: the memoized organic-corpus fit from
``operators.clustering`` (bit-deterministic, shared with
kmeans_assign/ann_ivf_topk, so the gate pays for ONE fit total).

Determinism: centroid literals round-trip via repr + CAST(VARCHAR AS
DOUBLE); cosine is the functions.vectors left-fold contract; drop
resolution is pure integer min/count — all bit-identical across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.vectors import (
    as_double,
    dot_sql,
    dot as vdot,
    normalized,
    normalized_sql,
)
from ..functions.barrier import barrier
from .clustering import (
    K_LITERAL_MAX,
    _assign_expr,
    _centroids_cte,
    fit_and_assign_table,
    kmeans_fit,
)
from .embedding_dedup import DEDUP_COS_THRESHOLD, build_neardup_corpus
from ..sources.tables import fan_out_width_path


def _fit(sf_dir: str):
    from ..session import active_or_local

    spark = active_or_local("semdedup_oracle")
    return spark, kmeans_fit(spark, sf_dir, k=_semdedup_k(spark, sf_dir))


_ASSIGNED_CACHE: dict[tuple, DataFrame] = {}
_K_CACHE: dict[str, int] = {}

# Target E|cluster| for the adaptive fit width (r8 — executes the
# docstring's "raise k so E|cluster| stays ~constant" contract that
# the 10× scale probe showed mattering: fixed k=8 measured 13× for
# 10× rows). 256 keeps k == K_CLUSTERS at every gate scale (corpus
# 550 / 2050 rows → max(8, n//256) = 8), so gated plans, centroid
# literals, and results are bit-identical to the fixed-k fit there;
# at the 10× probe (20050 rows) k grows to 78 and intra-cell pair
# work stays ~constant per row.
SEMDEDUP_TARGET_CELL = 256


def _semdedup_k(spark: SparkSession, sf_dir: str) -> int:
    k = _K_CACHE.get(sf_dir)
    if k is None:
        n = spark.read.parquet(build_neardup_corpus(spark, sf_dir)).count()
        from .clustering import K_CLUSTERS, K_HARD_CAP

        # linear until K_HARD_CAP, constant beyond — production
        # SemDeDup holds k ~constant at web scale (Abbas et al. §3)
        # rather than growing it with the corpus; past the cap, cells
        # grow and the within-cell scan cost per row grows with
        # n/K_HARD_CAP, the accepted trade (VERDICT r11 #2).
        k = max(K_CLUSTERS, min(n // SEMDEDUP_TARGET_CELL, K_HARD_CAP))
        _K_CACHE[sf_dir] = k
    return k


def _assigned_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The build-once SemDeDup index — (vec_id, cluster, unit vector)
    materialized behind an agg barrier so every candidate pair pays a
    single dot product, MEMOIZED per (application, sf_dir) like
    ``similarity.unit_vector_index`` (r7): repeated calls in one
    session (bench reps, the gate's dual execution) probe the same
    executor-resident blocks instead of re-running the broadcast-
    centroid argmin + normalization over the corpus. Lazy
    (eager=False): plan construction must not launch the staging /
    assignment jobs — r5 review."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _ASSIGNED_CACHE.get(key)
    if cached is None:
        k = _semdedup_k(spark, sf_dir)
        corpus = spark.read.parquet(build_neardup_corpus(spark, sf_dir))
        vecs = corpus.select(
            "vec_id", as_double(F.col("embedding")).alias("v")
        )
        if k <= K_LITERAL_MAX:
            centroids = kmeans_fit(spark, sf_dir, k=k)
            assigned = vecs.withColumn("cluster", _assign_expr(centroids))
        else:
            # the k > K_LITERAL_MAX scale path (VERDICT r11 #2): fit +
            # assign against a centroid TABLE — no O(k) plan literal,
            # no per-iteration k×dim driver collect. Never reached at
            # gate/probe scale (k ≤ 78 there), exercised by
            # tests/test_clustering.py's table-path tests; the oracle
            # stays centroid-literal because the gate never runs here.
            assigned = fit_and_assign_table(spark, vecs, k)
        idx = (
            assigned
            .select("vec_id", "cluster", normalized(F.col("v")).alias("vn"))
            .groupBy("vec_id")  # agg barrier: argmin + normalize once
            .agg(F.first("vn").alias("vn"), F.first("cluster").alias("cluster"))
        )
        cached = barrier(
            idx,
            "corpus",
            "semdedup assigned unit-vector index",
            eager=False,
        )
        _ASSIGNED_CACHE[key] = cached
    return cached


def semdedup_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The within-cluster candidate pair scan — (keep_id, drop_id,
    cos_sim) for every same-cluster id-ordered pair, BEFORE the cosine
    threshold. Shared by ``semdedup_dropped`` and the scale gate
    (tests/test_scale_gates.py): its COUNT is Σ_cells C(|cell|, 2),
    the deterministic quantity the adaptive-k contract bounds — the
    load-immune gate target (VERDICT r15 #6, the r14 IVF pattern)."""
    assigned = _assigned_index(spark, sf_dir)
    # r16 (guide §2.2/§2.4, VERDICT r15 #1/#2): repartition by the join
    # key at the core budget ON THE CONSUMER SIDE. A lazy localCheckpoint
    # surfaces as UnknownPartitioning (plan-verified: Scan ExistingRDD,
    # UnknownPartitioning(0)), so the self-join must exchange either
    # way — but an ENSURE_REQUIREMENTS exchange is AQE-coalescible and
    # the default 1 MB floor (restored this round; the r15 session-wide
    # 48 KB floor was the headline-regression suspect) collapses this
    # ≈1 MB index to ONE post-shuffle partition, serializing the
    # Σ|cluster|² dot-product stage on one core of 32. An explicit-width
    # repartition satisfies the same ClusteredDistribution(cluster) (no
    # extra exchange vs today) and is exempt from coalescing, so the
    # pair scan runs up to min(w, k)-wide. Size-gated by the staged
    # corpus: width 0 above 256 MB, where today's AQE-sized exchange
    # returns unchanged.
    fan = fan_out_width_path(build_neardup_corpus(spark, sf_dir))
    if fan:
        assigned = assigned.repartition(fan, "cluster")
    # corpus × corpus self-join (one row per vector each side): pin
    # SHUFFLE_HASH against size misestimates (r10 audit, see
    # dedup.dedup_ngram_jaccard).
    a = assigned.alias("a").hint("shuffle_hash")
    b = assigned.alias("b")
    cos = vdot(F.col("a.vn"), F.col("b.vn"))
    return a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("keep_id"),
        F.col("b.vec_id").alias("drop_id"),
        cos.alias("cos_sim"),
    )


def semdedup_dropped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors SemDeDup would drop from the planted corpus at
    cos ≥ 0.9: for each dropped vec the kept representative (lowest
    dup-partner id — deterministic keep-one rule) and its dup-partner
    count within the cluster.

    Plan: assignment is a broadcast-centroid argmin projection (no
    shuffle) over the RAW vectors (matching the fit), then vectors
    unit-normalize ONCE behind a groupBy(vec_id) barrier +
    localCheckpoint — so each candidate pair pays a single dot
    product, not dot + two norms (the 3× lesson from
    embedding_similar_pairs, re-measured here: 17.7 s → ~6 s at
    sf0.1); the pair scan is a self-equi-join ON CLUSTER (shuffle on
    the cluster id, pairs bounded by Σ|cluster|² — the SemDeDup
    contract that k scales to keep clusters small); drop resolution
    is one more aggregation keyed on the dropped vec. The "raise k so
    E|cluster| stays ~constant" contract is now EXECUTED, not prose:
    the fit width is ``max(K_CLUSTERS, n // SEMDEDUP_TARGET_CELL)`` —
    identical to the fixed k at every gate scale, growing with the
    corpus beyond (10× probe: k 8→78, ratio 13.0×→ see BASELINE)."""
    pairs = semdedup_scored_pairs(spark, sf_dir).where(
        F.col("cos_sim") >= DEDUP_COS_THRESHOLD
    )
    return pairs.groupBy(F.col("drop_id").alias("vec_id")).agg(
        F.min("keep_id").alias("representative"),
        F.count("*").alias("n_dup_partners"),
    )


def semdedup_dropped_oracle(sf_dir: str) -> str:
    """Lazy DuckDB twin: same staged corpus, same centroid literals,
    same argmin (ROW_NUMBER over (s, cluster) — first-wins tie rule
    of ``_assign_expr``), same within-cluster pair predicate."""
    spark, centroids = _fit(sf_dir)
    path = build_neardup_corpus(spark, sf_dir)
    cos = dot_sql("a.vn", "b.vn")
    return f"""
WITH cent AS ({_centroids_cte(centroids)}),
vec AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM read_parquet('{path}/*.parquet')),
scored AS (
  SELECT vec_id, v, cluster, n2 - 2.0 * {dot_sql('v', 'c')} AS s
  FROM vec CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, {normalized_sql('v')} AS vn, cluster
  FROM (SELECT vec_id, v, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cluster) AS rn
        FROM scored)
  WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS keep_id, b.vec_id AS drop_id, {cos} AS cos_sim
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {cos} >= {DEDUP_COS_THRESHOLD}
)
SELECT drop_id AS vec_id, MIN(keep_id) AS representative,
       COUNT(*) AS n_dup_partners
FROM pairs GROUP BY drop_id
"""


# --- semantic decontamination (r15, EXT) -------------------------------------
#
# Eval-set decontamination in EMBEDDING space — the companion to
# curation.decontaminate_train's n-gram form: a train document whose
# embedding sits within cos >= tau of ANY held-out eval embedding is a
# paraphrase-level leak that shingle overlap misses (the reason
# phi-class data pipelines run both passes). Same held-out split rule
# as the n-gram form (id % EVAL_MOD == EVAL_REM, applied to vec_id).
#
# Plan shape: REUSES the gated IVF candidate machinery verbatim —
# clustering.ivf_pair_candidates (learned-cell blocked pair join,
# SHUFFLE_HASH-pinned, adaptive k) generates the vec1 < vec2 candidate
# pairs; this operator verifies the exact cosine, keeps only
# CROSS-SPLIT pairs, and aggregates per train vector. Zero new join
# shapes; candidates are the same 10.96x-at-10x-gated quantity.


def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-TRAIN-vector semantic contamination report:
    (vec_id, n_eval_matches, max_eval_cos, contaminated) — matches are
    eval vectors sharing an IVF probe cell with exact cosine >=
    the pair family's weak tau (0.40: the audit threshold; a
    production pass would sweep it exactly like the quality ladder).
    Sentinels, not NULLs, for clean vectors (the dedup_incremental
    contract)."""
    from .clustering import ivf_pair_candidates
    from .curation import EVAL_MOD, EVAL_REM
    from .dedup import COSINE_SIMILAR_THRESHOLD

    base, cands = ivf_pair_candidates(spark, sf_dir)
    ev1 = F.col("vec1") % EVAL_MOD == EVAL_REM
    ev2 = F.col("vec2") % EVAL_MOD == EVAL_REM
    # r15 (guide §2.3 — filter before the joins, per-vector norms):
    # (a) the eval-cross restriction is pure id arithmetic on the
    # candidate row, so it prunes ~2/3 of candidates BEFORE the two
    # vector-fetch joins and the 64-dim verify instead of after them
    # (a filter on (vec1, vec2) commutes with joins that only attach
    # columns — output identical); (b) ‖v‖ is computed once per
    # VECTOR, not twice per pair, exactly as in
    # clustering.embedding_similar_pairs_ivf (same fold on the same
    # inputs → bit-identical doubles; the cos expression keeps the
    # exact divide(dot, multiply(n1, n2)) tree).
    based = base.withColumn("nrm", F.sqrt(vdot(F.col("v"), F.col("v"))))
    cos = vdot(F.col("e1.v"), F.col("e2.v")) / (
        F.col("e1.nrm") * F.col("e2.nrm")
    )
    pairs = (
        cands.where(ev1 != ev2)
        .join(
            based.alias("e1").hint("shuffle_hash"),
            F.col("vec1") == F.col("e1.vec_id"),
        )
        .join(
            based.alias("e2").hint("shuffle_hash"),
            F.col("vec2") == F.col("e2.vec_id"),
        )
        .select("vec1", "vec2", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= COSINE_SIMILAR_THRESHOLD)
    )
    cross = pairs.select(
        F.when(ev1, F.col("vec2")).otherwise(F.col("vec1")).alias("train_id"),
        "cos_sim",
    )
    hits = cross.groupBy("train_id").agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("cos_sim").alias("max_eval_cos"),
    )
    train = base.where(F.col("vec_id") % EVAL_MOD != EVAL_REM).select("vec_id")
    return train.join(
        hits.hint("shuffle_hash"),
        train.vec_id == hits.train_id,
        "left",
    ).select(
        "vec_id",
        F.coalesce("n_eval_matches", F.lit(0)).cast("long").alias("n_eval_matches"),
        F.coalesce("max_eval_cos", F.lit(0.0)).alias("max_eval_cos"),
        F.col("train_id").isNotNull().alias("contaminated"),
    )


def decontaminate_semantic_oracle(sf_dir: str) -> str:
    """Lazy twin: the hash-gated pair family oracle as the pairs CTE,
    then the identical split/agg SQL."""
    from .clustering import embedding_similar_pairs_ivf_oracle
    from .curation import EVAL_MOD, EVAL_REM

    return f"""
WITH pairs AS ({embedding_similar_pairs_ivf_oracle(sf_dir)}),
cross_pairs AS (
  SELECT CASE WHEN vec1 % {EVAL_MOD} = {EVAL_REM} THEN vec2 ELSE vec1 END
           AS train_id,
         cos_sim
  FROM pairs
  WHERE (vec1 % {EVAL_MOD} = {EVAL_REM}) != (vec2 % {EVAL_MOD} = {EVAL_REM})
),
hits AS (
  SELECT train_id, COUNT(*) AS n_eval_matches, MAX(cos_sim) AS max_eval_cos
  FROM cross_pairs GROUP BY train_id
)
SELECT e.vec_id,
       CAST(COALESCE(h.n_eval_matches, 0) AS BIGINT) AS n_eval_matches,
       COALESCE(h.max_eval_cos, 0.0) AS max_eval_cos,
       h.train_id IS NOT NULL AS contaminated
FROM (SELECT DISTINCT vec_id FROM embeddings
      WHERE vec_id % {EVAL_MOD} != {EVAL_REM}) e
LEFT JOIN hits h ON e.vec_id = h.train_id
"""


QUERIES = {
    "semdedup_dropped": (semdedup_dropped, semdedup_dropped_oracle),
    "decontaminate_semantic": (
        decontaminate_semantic,
        decontaminate_semantic_oracle,
    ),
}
