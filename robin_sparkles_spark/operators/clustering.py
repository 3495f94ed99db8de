"""Distributed k-means over the embeddings table + the IVF ANN search
it enables (EXT — the "IVF or LSH-bucketed variant" scale path from
the north star).

The FIT is iterative (multi-job), so no single SQL statement can
replicate it — but once centroids are fixed, assignment is a pure
argmin projection and IVF search is a plain equi-join, both fully
SQL-expressible. The oracles therefore run the fit first and inline
the fitted k × dim centroids as literals into a DuckDB twin
(VERDICT r02 ask #3): ``QUERIES`` registers *callables*
``(sf_dir) -> str`` that the registry / gate resolves lazily, so both
queries hash-match instead of the weaker rows-only contract.

Cross-process determinism (the oracle may be generated in a different
process from the one that ran the Spark query, so the fit itself must
be bit-reproducible): per-cluster partial sums accumulate in exact
DECIMAL(38,18) — order-independent, unlike double addition — and the
only double ops (centroid division, argmin scores) happen driver-side
in a fixed sequence. Centroid literals round-trip through repr +
CAST(VARCHAR AS DOUBLE) (both correctly rounded), and the score /
cosine expressions mirror functions.vectors' left-fold contract, so
doubles are bit-identical across engines.

Scale shape per iteration (the textbook Spark k-means):
- centroids live driver-side (k × dim doubles — tiny) and broadcast;
- assignment is a per-row argmin projection (no shuffle);
- re-estimation is one groupBy(cluster) partial+final aggregation of
  per-dimension sums (one shuffle of k × dim partial sums per
  partition, not of the data).
Fixed seed-free init (first k vec_ids of the training set) + fixed
iteration count keep the fit deterministic. Iterations train on a
bounded deterministic sample (≤ SAMPLE_PER_CENTROID·k vectors —
VERDICT r13 #3), so fit cost is corpus-independent; only the final
assignment scans the full corpus. Identity at every gated SF.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.barrier import barrier
from ..functions.litconst import memo_expr, probe_cells_sql
from ..functions.vectors import as_double, dot, dot_sql
from ..sources import load_table
from ..sources.tables import fan_out_width

K_CLUSTERS = 8
N_ITER = 5
IVF_TOP_K = 5
IVF_N_QUERIES = 100

# --- k-scaling laws (VERDICT r11 #2) -----------------------------------------
# The literal-plan argmin embeds k×dim doubles in the Catalyst plan and
# the fit collects k×dim decimal sums per iteration — both fine at
# fixture k (8) and probe k (78), both killers at the linear-k SemDeDup
# contract (k = n/256 → ~4M centroids at 10⁹ docs). Two caps close it:
#
# K_LITERAL_MAX — widest centroid matrix allowed as a plan literal.
#   Above it, assignment is a SHUFFLE_HASH equi-join against a centroid
#   TABLE, blocked by a COARSE quantizer cell (a small literal fit,
#   COARSE_K ≤ K_LITERAL_MAX) so there is no k-way cross term: vectors
#   probe their ASSIGN_NPROBE nearest coarse cells and meet only the
#   centroids whose own coarse cell matches — the FAISS two-level
#   (IVF-of-centroids) shape. Approximate by construction (exact iff
#   nprobe = COARSE_K); tests/test_clustering.py pins full-probe
#   bit-parity with the literal path and gates the default-probe
#   assignment recall.
#
# K_HARD_CAP — the documented sublinear k law. Production SemDeDup
#   holds k roughly constant (~10⁴–10⁵ clusters at web scale, Abbas et
#   al. §3) rather than growing it with the corpus; past the cap,
#   cells grow linearly and the within-cell pair scan cost per row
#   grows with n/K_HARD_CAP — the accepted production trade. The
#   adaptive-k helpers below apply min(n // target_cell, K_HARD_CAP).
K_LITERAL_MAX = 256
K_HARD_CAP = 131_072
COARSE_K = 64  # coarse-quantizer floor for the join form (literal-safe)
ASSIGN_NPROBE = 8  # coarse cells each vector probes in the join form
# Target centroids per coarse cell: the coarse width grows with k
# (clamped to [COARSE_K, K_LITERAL_MAX]) so candidate work per vector
# stays ≈ ASSIGN_NPROBE · COARSE_FANOUT until the coarse cap, then
# ≤ ASSIGN_NPROBE · K_HARD_CAP/K_LITERAL_MAX = 4096 candidates/vector
# at the k ceiling — bounded, independent of corpus size.
COARSE_FANOUT = 4


def _coarse_k_for(k: int) -> int:
    return min(K_LITERAL_MAX, max(COARSE_K, k // COARSE_FANOUT))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )


def _assign_expr(
    centroids: list[list[float]], vec_col: str = "v"
) -> F.Column:
    """argmin over squared distances to literal centroids.
    ‖v−c‖² = ‖v‖² − 2⟨v,c⟩ + ‖c‖²; ‖v‖² is cluster-invariant, so
    argmin needs only ⟨v,c⟩ and ‖c‖².

    Shape (r8): ONE aggregate over a 2-D centroid-matrix literal, not
    k chained when/least trees — the adaptive-k SemDeDup fit hit the
    same Catalyst-analysis wall as the projection bank (k=78 fit:
    465 s first action with the chain). Semantics preserved exactly:
    per-centroid dot is the same sequential zip_with/aggregate fold
    (oracle bit-parity), strict `<` keeps the first minimal index on
    ties (matching the ROW_NUMBER `ORDER BY s, cluster` oracle rule).
    Doubles are inlined via repr→CAST (shortest-repr round-trip is
    exact).

    This literal form ships k×dim doubles INSIDE THE PLAN, so it is
    capped at K_LITERAL_MAX centroids — past that, assignment goes
    through the centroid-TABLE join (``assign_via_table``), VERDICT
    r11 #2."""
    k = len(centroids)
    if k > K_LITERAL_MAX:
        raise ValueError(
            f"k={k} exceeds K_LITERAL_MAX={K_LITERAL_MAX}: a k×dim "
            "plan literal at this width is a Catalyst/driver killer — "
            "use assign_via_table / kmeans_fit_table (the join form)"
        )

    def d(x: float) -> str:
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    c_lit = "array(" + ",".join(
        "array(" + ",".join(d(x) for x in c) + ")" for c in centroids
    ) + ")"
    n2_lit = "array(" + ",".join(
        d(sum(x * x for x in c)) for c in centroids
    ) + ")"
    score = f"""
      element_at({n2_lit}, i + 1) - CAST(2.0 AS DOUBLE) *
        aggregate(zip_with({vec_col}, element_at({c_lit}, i + 1), (x, c) -> x * c),
                  CAST(0 AS DOUBLE), (acc, y) -> acc + y)
    """
    # memo_expr (r15): the argmin string is a pure function of the
    # fitted centroids, so re-parsing it on every plan construction
    # is wasted py4j/parser work — see functions.litconst.
    return memo_expr(
        f"""
        aggregate(sequence(0, {k - 1}),
          named_struct('idx', CAST(0 AS INT),
                       'best', CAST('Infinity' AS DOUBLE)),
          (st, i) -> IF(({score}) < st.best,
                        named_struct('idx', CAST(i AS INT),
                                     'best', CAST(({score}) AS DOUBLE)),
                        st),
          st -> st.idx)
        """
    )


_FIT_CACHE: dict[tuple, list[list[float]]] = {}
# Serializes the fit's session-conf toggle: two interleaved fits could
# otherwise each snapshot the other's temporary 'false' as "previous"
# and leave codegen permanently off for the session (r5 review).
_FIT_LOCK = threading.Lock()


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    k: int = K_CLUSTERS,
    n_iter: int = N_ITER,
    disable_codegen: bool = True,
) -> list[list[float]]:
    """Lloyd's iterations; returns the final centroids (driver-side
    k × dim list). Init: the first k vectors by vec_id (deterministic,
    no RNG). Memoized per (sf_dir, k, n_iter): both declared queries
    need the same fit, and re-running 5 iterations of Spark jobs for
    each would double the correctness gate's cost for no information.

    Sampled-fit law (VERDICT r13 #3): iterations train on the bounded
    ``_fit_training_sample`` (≤ SAMPLE_PER_CENTROID·k vectors), so the
    fit's cost is corpus-independent; consumers assign the full corpus
    exactly ONCE with the fitted centroids. Identity at every
    gated/benched SF (corpora sit under the cap) — bit-identical
    centroids to the pre-sampling fit there; past the cap the
    quality trade is gated by the inertia test in
    tests/test_clustering.py."""
    key = (sf_dir, k, n_iter)
    if key in _FIT_CACHE:
        return _FIT_CACHE[key]
    # materialize the cast vectors once: every iteration (and the init
    # collect) reuses the persisted partitions instead of re-scanning
    # parquet + re-casting
    vecs = barrier(
        _vectors(spark, sf_dir), "corpus", "kmeans_fit cast vectors"
    )
    train = _fit_training_sample(spark, vecs, k)
    centroids = _fit_literal(spark, train, k, n_iter, disable_codegen)
    _FIT_CACHE[key] = centroids
    return centroids


def _fit_literal(
    spark: SparkSession,
    vecs: DataFrame,
    k: int,
    n_iter: int,
    disable_codegen: bool = True,
) -> list[list[float]]:
    """The literal-plan Lloyd's loop over a (vec_id, v) DataFrame —
    extracted from ``kmeans_fit`` so the join-form fit can reuse it
    for its coarse quantizer. k ≤ K_LITERAL_MAX enforced by
    ``_assign_expr``."""
    dim = len(vecs.first().v)
    centroids = [r.v for r in vecs.orderBy("vec_id").limit(k).collect()]
    # Codegen OFF for the fit only: each iteration's centroid literals
    # are NEW, so whole-stage codegen recompiles the k×dim argmin +
    # 64-column decimal aggregate every iteration and the JIT cost can
    # never amortize (measured 2×: ~5.6 s → ~2 s per iteration at
    # sf0.1). The interpreter evaluates the SAME expression tree —
    # bit-identical results (pinned by test_kmeans_fit_codegen_parity).
    # Declared queries (assign/IVF/SemDeDup) keep codegen: their
    # expression is compiled once and streams the whole corpus.
    # (disable_codegen=False exists only for the parity test pinning
    # that both execution modes produce the same bits)
    #
    # The toggle mutates SESSION conf, so _FIT_LOCK serializes fits:
    # unsynchronized, an interleaved fit snapshots the other's
    # temporary 'false' as "previous" and the finally-restore leaves
    # codegen off for the rest of the session. Unrelated queries
    # running concurrently in the same session during the ~seconds of
    # fit still execute interpreted — acceptable for this driver-side
    # model fit; a production job would fit in its own session.
    with _FIT_LOCK:
        prev_codegen = spark.conf.get("spark.sql.codegen.wholeStage", "true")
        if disable_codegen:
            spark.conf.set("spark.sql.codegen.wholeStage", "false")
        try:
            for _ in range(n_iter):
                assigned = vecs.withColumn("cluster", _assign_expr(centroids))
                # DECIMAL partial sums: double addition is order-
                # dependent, and Spark's merge order varies with
                # partitioning/task completion — exact decimal
                # accumulation makes the fit bit-reproducible across
                # processes, which the centroid-literal oracles require.
                sums = assigned.groupBy("cluster").agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(
                            F.element_at(F.col("v"), i + 1).cast(
                                "decimal(38,18)"
                            )
                        ).alias(f"s{i}")
                        for i in range(dim)
                    ],
                )
                new_centroids = list(centroids)
                for row in sums.collect():
                    new_centroids[row.cluster] = [
                        float(row[f"s{i}"]) / row.n for i in range(dim)
                    ]
                centroids = new_centroids
        finally:
            spark.conf.set("spark.sql.codegen.wholeStage", prev_codegen)
    return centroids


# Training points per centroid (the FAISS-style convention): past
# SAMPLE_PER_CENTROID·k vectors, EVERY Lloyd's fit in this module —
# the literal fit, the table fit's main loop, and the coarse
# quantizer — trains on a deterministic hash sample instead of the
# full corpus, making per-iteration fit cost corpus-INDEPENDENT
# (VERDICT r13 #3, generalizing the r12 coarse-only fix). The r12
# 100× probe (200k vectors) measured the unsampled form: 5
# full-corpus interpreted passes per fit — O(corpus · n_iter) the
# exact cost class a 100 TB fit cannot pay; only the ONE final
# assignment pass should touch the whole corpus. The sample is
# uniform by xxhash64(vec_id) (representative regardless of vec_id
# layout — first-N-ids would train on whatever subset happens to
# sort first) and repartitioned to the session parallelism so a
# badly-laid-out corpus (single-row-group staging, few huge files)
# cannot serialize the fit. Spark-only determinism is sufficient for
# the oracles: every centroid-literal oracle re-derives its fit by
# re-RUNNING the same sampled fit (bit-deterministic — the sample
# predicate, init order, and decimal sums are all engine-state-free),
# so Spark query and DuckDB twin always see identical centroids. At
# every gated/benched SF the corpora (≤2000 vectors) sit UNDER the
# k=8 cap (2048), so gated fits are bit-identical to the pre-sampling
# form; the quality cost past the cap is measured, not assumed —
# tests/test_clustering.py gates sampled-fit inertia vs the full fit.
SAMPLE_PER_CENTROID = 256

# Sampling-fraction granularity. 1<<32 (not 1<<16 — ADVICE r12): with
# a 16-bit denominator the threshold floors at 1 once n > 65536·cap
# (~3.4e8 vectors at k=8), past which the sample grows as n/65536 and
# fit cost becomes corpus-dependent again. xxhash64 is 64-bit, so a
# 32-bit denominator keeps the fraction shrinking toward cap/n until
# n > 2³²·cap — beyond any corpus this engine will meet.
_SAMPLE_DENOM = 1 << 32


def _fit_training_sample(
    spark: SparkSession,
    vecs: DataFrame,
    k: int,
    per_centroid: int = SAMPLE_PER_CENTROID,
    salt: int | None = None,
) -> DataFrame:
    """Bounded, deterministic training set for a k-centroid fit:
    identity (modulo a parallelism repartition) below the
    ``per_centroid·k`` cap, a uniform xxhash64(vec_id) sample above
    it. The repartition matters either way: the fit's interpreted
    argmin is CPU-bound, so training must spread across the session's
    cores even when the staged input has few/unsplittable files.

    ``salt`` makes the draw independent of an unsalted (or
    differently-salted) draw over the same rows — REQUIRED when
    sampling a frame that is itself an xxhash64(vec_id) sample
    (ADVICE r14: a nested UNsalted draw re-filters hashes already
    conditioned on [0, thresh₁), so the second threshold — computed
    from the inner frame's count as if hashes were uniform on the
    full range — under-filters by up to n/cap₁, breaking the sample
    cap it was meant to enforce)."""
    cap = per_centroid * k
    n = vecs.count()
    par = spark.sparkContext.defaultParallelism
    if n <= cap:
        return vecs.repartition(par)
    h = (
        F.xxhash64("vec_id")
        if salt is None
        else F.xxhash64("vec_id", F.lit(salt))
    )
    thresh = max(1, (_SAMPLE_DENOM * cap) // n)
    return barrier(
        vecs.where(F.pmod(h, F.lit(_SAMPLE_DENOM)) < thresh).repartition(par),
        "sample",
        "kmeans fit training sample",
    )


# --- centroid-TABLE join assignment (the k > K_LITERAL_MAX path) -------------

def _centroid_table(
    spark: SparkSession, centroids_df: DataFrame, coarse: list[list[float]]
) -> DataFrame:
    """(cluster, c, n2, ccell): each centroid tagged with its squared
    norm and its own coarse-quantizer cell. O(k) rows — 'vocab' bound;
    the per-row coarse argmin is the constant-width COARSE_K literal,
    never O(k)."""
    n2 = F.aggregate(
        F.col("c"), F.lit(0.0), lambda acc, x: acc + x * x
    ).alias("n2")
    return centroids_df.select(
        "cluster", "c", n2, _assign_expr(coarse, vec_col="c").alias("ccell")
    )


def assign_via_table(
    spark: SparkSession,
    vecs: DataFrame,
    centroids_df: DataFrame,
    coarse: list[list[float]],
    nprobe: int = ASSIGN_NPROBE,
) -> DataFrame:
    """Nearest-centroid assignment WITHOUT an O(k) plan literal:
    centroids live in a TABLE, vectors meet only the centroids sharing
    one of their ``nprobe`` nearest coarse cells (SHUFFLE_HASH
    equi-join on the cell — no k-way cross term, no corpus broadcast),
    and the argmin is a lexicographic struct-min over the candidates
    (min over (s, cluster) — the same first-wins tie rule as
    ``_assign_expr``'s strict `<`).

    Exact iff ``nprobe == len(coarse)`` (every centroid reachable);
    at the default probe width it is the standard two-level
    approximation — the recall gate in tests/test_clustering.py
    measures the true-nearest hit rate on the fixture.

    Returns (vec_id, v, cluster) — v kept so the fit's re-estimation
    doesn't re-join the corpus.

    Scale: vector side explodes to nprobe rows; candidate rows per
    vector ≈ nprobe · k / COARSE_K (cells hold ~k/COARSE_K centroids).
    Both join sides shuffle on the cell id; centroid side is 'vocab'
    bound. The score is the same ‖c‖² − 2⟨v,c⟩ left fold as the
    literal form, so scored candidates produce bit-identical doubles
    (full-probe parity is pinned in tests)."""
    probed = vecs.withColumn(
        "ccell", F.explode(_probe_cells_expr(coarse, nprobe))
    )
    cand = probed.hint("shuffle_hash").join(
        _centroid_table(spark, centroids_df, coarse), "ccell"
    )
    s = F.col("n2") - 2.0 * dot(F.col("v"), F.col("c"))
    best = (
        cand.select(
            "vec_id",
            "v",
            F.struct(s.alias("s"), F.col("cluster").alias("cluster")).alias(
                "sc"
            ),
        )
        .groupBy("vec_id")
        .agg(F.first("v").alias("v"), F.min("sc").alias("m"))
        .select("vec_id", "v", F.col("m.cluster").alias("cluster"))
    )
    return best


def probe_via_table(
    spark: SparkSession,
    vecs: DataFrame,
    centroids_df: DataFrame,
    coarse: list[list[float]],
    nprobe_cells: int,
    nprobe_coarse: int = ASSIGN_NPROBE,
) -> DataFrame:
    """Table twin of ``_probe_cells_expr``: the ``nprobe_cells``
    nearest TABLE centroids per vector, searched within the vector's
    ``nprobe_coarse`` nearest coarse cells (same candidate join as
    ``assign_via_table``, ranked by (s, cluster) — the ordering
    ``array_sort`` applies in the literal form). Returns exploded
    (vec_id, probe) rows — the shape multi-probe IVF consumers join
    on."""
    probed = vecs.withColumn(
        "ccell", F.explode(_probe_cells_expr(coarse, nprobe_coarse))
    )
    cand = probed.hint("shuffle_hash").join(
        _centroid_table(spark, centroids_df, coarse), "ccell"
    )
    s = (F.col("n2") - 2.0 * dot(F.col("v"), F.col("c"))).alias("s")
    w = W.partitionBy("vec_id").orderBy("s", "cluster")
    return (
        cand.select("vec_id", s, "cluster")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe_cells)
        .select("vec_id", F.col("cluster").alias("probe"))
    )


def kmeans_fit_table(
    spark: SparkSession,
    vecs: DataFrame,
    k: int,
    n_iter: int = N_ITER,
    nprobe: int = ASSIGN_NPROBE,
    coarse_k: int | None = None,
) -> DataFrame:
    """Lloyd's iterations with DISTRIBUTED centroids — the k >
    K_LITERAL_MAX scale path (VERDICT r11 #2). Nothing O(k) ever
    reaches the driver or the plan: init is the first k vectors by
    vec_id (top-k, not a global sort), assignment is the coarse-celled
    SHUFFLE_HASH join above, re-estimation is one groupBy(cluster)
    decimal aggregation whose means are computed EXECUTOR-side
    (decimal→double cast, then double division — the identical IEEE
    sequence the literal fit runs driver-side, so a full-probe table
    fit reproduces the literal fit bit-for-bit). Empty clusters keep
    their previous centroid via a left join + coalesce, matching the
    literal loop's new_centroids[cluster]-only updates. Each
    iteration's centroid table is barriered ('vocab') to cut the
    iterative lineage.

    Returns (final (cluster, c) DataFrame, coarse centroids) — the
    coarse quantizer travels with the table so assignments use the
    same cells the fit did."""
    vecs = barrier(vecs, "corpus", "kmeans_fit_table cast vectors")
    # Sampled-fit law (VERDICT r13 #3): the Lloyd's loop — init,
    # per-iteration assignment, and the coarse quantizer it trains —
    # sees only the bounded sample; the caller's final assignment is
    # the ONLY full-corpus pass. The coarse sample is a SALTED nested
    # draw from the main training sample (ADVICE r14): train's hashes
    # are conditioned on [0, thresh₁), so re-drawing with the SAME
    # unsalted predicate under-filters (up to ~k/coarse_k over the
    # 256·coarse_k cap); the salt makes the second fraction
    # independent, restoring the cost bound. Both draws are identity
    # below their caps, so gate-SF fits are bit-identical either way.
    train = _fit_training_sample(spark, vecs, k)
    dim = len(train.first().v)
    if coarse_k is None:
        coarse_k = _coarse_k_for(k)
    coarse = _fit_literal(
        spark,
        _fit_training_sample(
            spark, train, min(coarse_k, K_LITERAL_MAX), salt=1
        ),
        min(coarse_k, K_LITERAL_MAX),
        n_iter,
    )
    w = W.orderBy("vec_id")
    centroids_df = barrier(
        train.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).cast("int").alias("cluster"),
            F.col("v").alias("c"),
        ),
        "vocab",
        "kmeans_fit_table init centroids",
    )
    for _ in range(n_iter):
        assigned = assign_via_table(spark, train, centroids_df, coarse, nprobe)
        sums = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[
                F.sum(
                    F.element_at(F.col("v"), i + 1).cast("decimal(38,18)")
                ).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        new_c = sums.select(
            "cluster",
            F.array(
                *[
                    F.col(f"s{i}").cast("double") / F.col("n")
                    for i in range(dim)
                ]
            ).alias("c_new"),
        )
        centroids_df = barrier(
            centroids_df.join(new_c, "cluster", "left").select(
                "cluster", F.coalesce("c_new", "c").alias("c")
            ),
            "vocab",
            "kmeans_fit_table centroids",
        )
    return centroids_df, coarse


def fit_and_assign_table(
    spark: SparkSession,
    vecs: DataFrame,
    k: int,
    n_iter: int = N_ITER,
    nprobe: int = ASSIGN_NPROBE,
    coarse_k: int | None = None,
) -> DataFrame:
    """One-call join-form fit + final assignment: (vec_id, v, cluster).
    The entry point consumers dispatch to when their adaptive k
    exceeds K_LITERAL_MAX."""
    if coarse_k is None:
        coarse_k = _coarse_k_for(k)
    centroids_df, coarse = kmeans_fit_table(
        spark, vecs, k, n_iter, nprobe, coarse_k
    )
    return assign_via_table(spark, vecs, centroids_df, coarse, nprobe)


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
    constant-width per-row projection like ``_assign_expr``. Rendered
    as ONE memoized SQL string (r15): the element-wise ``F.lit`` form
    cost ~10·k·dim py4j round-trips per plan construction — see
    ``functions.litconst``. Arithmetic and tie rules unchanged."""
    return memo_expr(probe_cells_sql(centroids, nprobe))


IVF_NPROBE = 2


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: cluster the corpus with k-means, then search each
    query's top-k within its ``IVF_NPROBE`` nearest cells — the
    equi-join-on-cell shape (like sign-LSH, but with learned,
    data-adaptive buckets). Multi-probe is the standard recall lever:
    the query side explodes to nprobe (query, cell) rows, the corpus
    side stays single-cell, and the join output grows ∝ nprobe, not
    corpus size (measured recall@5 vs exact: 0.36 at nprobe=1 → 0.54
    at nprobe=2 on the sf0.01 fixture; tests assert monotonicity).
    Full recall/latency curve at sf0.1 recorded in BASELINE.md
    ("ann_ivf_topk multi-probe", r7): 0.336 / 0.502 / 0.760 / 1.000
    at nprobe 1/2/4/8 — 1.000 at 8 is the exact-search limit since
    the fixture fit has K_CLUSTERS=8 cells."""
    return _ivf_topk(spark, sf_dir, IVF_NPROBE)


def _ivf_topk(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    centroids = kmeans_fit(spark, sf_dir)
    vecs = _vectors(spark, sf_dir).withColumn(
        "cluster", _assign_expr(centroids)
    )
    # r16 (guide §2.2/§2.4, VERDICT r15 #1/#2): pre-partition by the
    # aggregation key at the core budget. The groupBy below reuses this
    # explicit-width HashPartitioning (still exactly ONE exchange), but
    # unlike an AQE-planned exchange it is exempt from coalescing — at
    # the default 1 MB floor (restored this round) the ≈1 MB aggregate
    # collapsed to one post-shuffle partition, serializing the
    # broadcast-probe cell-scan dot products that run at this frame's
    # partitioning. Size-gated: width 0 once embeddings > 256 MB, where
    # the plan reverts to today's AQE-sized exchange.
    fan = fan_out_width(sf_dir, "embeddings")
    if fan:
        vecs = vecs.repartition(fan, "vec_id")
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
    # r15 (guide §2.3): ‖v‖ per VECTOR, not per joined pair — identical
    # single-assignment sqrt(dot(v, v)) on identical inputs, and the
    # final divide(dot, multiply(n_q, n_c)) tree is unchanged, so
    # doubles are bit-identical (A/B-hash-checked on the ivf pair
    # family; same argument here).
    q = probes.withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v")))).alias("q")
    c = vecs.withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v")))).alias("c")
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    # bounded query side — broadcast explicitly (r10 audit: never let
    # a misestimate broadcast the corpus-sized cell index instead)
    return (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.probe") == F.col("c.cluster"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            (
                dot(F.col("q.v"), F.col("c.v"))
                / (F.col("q.nrm") * F.col("c.nrm"))
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


# --- centroid-literal DuckDB oracles ---------------------------------------

def _fit_for_oracle(sf_dir: str) -> list[list[float]]:
    """Centroids for the oracle twin: the SAME memoized distributed fit
    the declared queries use (any live session works — the fit is
    bit-deterministic, see module docstring)."""
    from ..session import active_or_local

    return kmeans_fit(active_or_local("clustering_oracle"), sf_dir)


def _centroids_cte(centroids: list[list[float]]) -> str:
    """``cent(cluster, c, n2)`` VALUES rows. Every double goes through
    CAST('{repr}' AS DOUBLE): repr emits the shortest round-trip
    decimal string and DuckDB's varchar→double cast is correctly
    rounded, so the literal is the bit-identical double Spark's
    ``F.lit`` embeds. (A bare decimal literal would infer DECIMAL and
    double-round.) n2 = ‖c‖² is computed once in Python — the same
    scalar ``_assign_expr`` folds into its score."""
    rows = []
    for i, c in enumerate(centroids):
        arr = "[" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in c) + "]"
        n2 = float(sum(x * x for x in c))
        rows.append(f"({i}, {arr}, CAST('{n2!r}' AS DOUBLE))")
    return "SELECT * FROM (VALUES " + ",\n".join(rows) + ") t(cluster, c, n2)"


def _scored_ctes(centroids: list[list[float]]) -> str:
    """Shared CTE prefix: centroid literals, double-cast vectors, and
    per-(vector, cluster) argmin scores s = ‖c‖² − 2⟨v,c⟩ — the exact
    operation sequence of ``_assign_expr`` (‖v‖² dropped both sides)."""
    return f"""cent AS ({_centroids_cte(centroids)}),
vec AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
scored AS (
  SELECT vec_id, v, cluster, n2 - 2.0 * {dot_sql('v', 'c')} AS s
  FROM vec CROSS JOIN cent
)"""


def kmeans_assign_oracle(sf_dir: str) -> str:
    """DuckDB twin of ``kmeans_assign``: argmin via ROW_NUMBER ordered
    (s, cluster) — ties keep the lowest cluster index, matching
    ``_assign_expr``'s strict-< first-wins unroll."""
    centroids = _fit_for_oracle(sf_dir)
    return f"""
WITH {_scored_ctes(centroids)}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
FROM (SELECT vec_id, cluster,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cluster) AS rn
      FROM scored)
WHERE rn = 1
"""


def ann_ivf_topk_oracle(sf_dir: str) -> str:
    """DuckDB twin of ``ann_ivf_topk``: corpus side keeps its argmin
    cell, query side (vec_id < IVF_N_QUERIES) keeps its IVF_NPROBE
    nearest cells (same (s, cluster) ordering ``array_sort`` uses),
    candidates equi-join on the cell, cosine mirrors the Spark
    expression dot/(√·√) term-for-term."""
    centroids = _fit_for_oracle(sf_dir)
    cos = (
        f"{dot_sql('q.v', 'c.v')} / "
        f"(sqrt({dot_sql('q.v', 'q.v')}) * sqrt({dot_sql('c.v', 'c.v')}))"
    )
    return f"""
WITH {_scored_ctes(centroids)},
ranked AS (
  SELECT vec_id, v, cluster,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cluster) AS rn
  FROM scored
),
assigned AS (SELECT vec_id, v, cluster FROM ranked WHERE rn = 1),
probes AS (SELECT vec_id, v, cluster AS probe FROM ranked
           WHERE rn <= {IVF_NPROBE} AND vec_id < {IVF_N_QUERIES}),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM probes q JOIN assigned c
    ON q.probe = c.cluster AND q.vec_id != c.vec_id
),
topk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
  FROM cand
)
SELECT query_id, neighbor_id, cos_sim, CAST(rk AS BIGINT) AS rank
FROM topk WHERE rk <= {IVF_TOP_K}
"""


def ann_ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF multi-probe index vs the exact top-k — the
    IVF twin of ``similarity.ann_recall_at_k`` (VERDICT r6 ask #8
    recorded the full nprobe curve in BASELINE.md; this makes the
    shipped-default point a DECLARED, hash-gated query so a regression
    in either the fit or the probe logic shows up as a recall drop in
    the driver gate, not just a table going stale). Same staged exact
    ground-truth fixture (``similarity.build_exact_topk`` — k parity
    asserted below); the declared plan is scan + left join +
    aggregate, no quadratic step. recall = hits / (n_queries · k)
    divides exact ints, bit-identical across engines."""
    from .similarity import TOP_K, build_exact_topk

    if TOP_K != IVF_TOP_K:  # not assert: survives python -O (ADVICE r7)
        raise ValueError(
            f"ground-truth k ({TOP_K}) must match IVF k ({IVF_TOP_K}); "
            "recall@k would silently mis-scale"
        )
    bf = spark.read.parquet(build_exact_topk(spark, sf_dir))
    ivf = (
        ann_ivf_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("m", F.lit(1))
    )
    return (
        bf.join(ivf, ["query_id", "neighbor_id"], "left")
        .agg(
            F.countDistinct("query_id").alias("n_queries"),
            F.sum(F.coalesce(F.col("m"), F.lit(0))).cast("long").alias("hits"),
        )
        .select(
            F.lit(IVF_TOP_K).cast("long").alias("k"),
            F.lit(IVF_NPROBE).cast("long").alias("nprobe"),
            "n_queries",
            "hits",
            (
                F.col("hits").cast("double")
                / (F.col("n_queries") * IVF_TOP_K)
            ).alias("recall_at_k"),
        )
    )


def ann_ivf_recall_oracle(sf_dir: str) -> str:
    """DuckDB twin: recomputes BOTH sides from scratch — the exact
    top-k via the sanctioned brute-force SQL and the IVF side via the
    centroid-literal probe SQL — so the staged fixture itself is
    hash-checked too (same structure as ANN_RECALL_SQL)."""
    from .similarity import ANN_BRUTEFORCE_SQL

    return f"""
WITH bf AS ({ANN_BRUTEFORCE_SQL}),
ivf AS (SELECT query_id, neighbor_id FROM ({ann_ivf_topk_oracle(sf_dir)})),
j AS (
  SELECT bf.query_id,
         CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS m
  FROM bf LEFT JOIN ivf
    ON bf.query_id = ivf.query_id AND bf.neighbor_id = ivf.neighbor_id
)
SELECT CAST({IVF_TOP_K} AS BIGINT) AS k,
       CAST({IVF_NPROBE} AS BIGINT) AS nprobe,
       COUNT(DISTINCT query_id) AS n_queries,
       CAST(SUM(m) AS BIGINT) AS hits,
       CAST(SUM(m) AS DOUBLE) / (COUNT(DISTINCT query_id) * {IVF_TOP_K})
         AS recall_at_k
FROM j
"""


# --- IVF-blocked similar pairs (r8) -----------------------------------------

SIMILAR_IVF_NPROBE = 2
# Adaptive fit width over the embeddings table (same rule as
# semdedup.SEMDEDUP_TARGET_CELL over its planted corpus): unchanged
# k = K_CLUSTERS at every gate scale (500 / 2000 rows), cells held
# ~constant beyond — without it the 10× probe's pair scan inherits
# 2500-wide cells and goes quadratic.
IVF_PAIRS_TARGET_CELL = 256
_PAIRS_K_CACHE: dict[str, int] = {}


def _embeddings_k(spark: SparkSession, sf_dir: str) -> int:
    k = _PAIRS_K_CACHE.get(sf_dir)
    if k is None:
        n = load_table(spark, sf_dir, "embeddings").count()
        # linear until K_HARD_CAP, constant beyond (the documented
        # sublinear law — see the k-scaling block at the top)
        k = max(K_CLUSTERS, min(n // IVF_PAIRS_TARGET_CELL, K_HARD_CAP))
        _PAIRS_K_CACHE[sf_dir] = k
    return k


def ivf_pair_candidates(
    spark: SparkSession, sf_dir: str
) -> "tuple[DataFrame, DataFrame]":
    """The candidate stage of ``embedding_similar_pairs_ivf``, factored
    out (r15 — VERDICT r14 #1) so the scale gate can count VERIFY
    CANDIDATES deterministically instead of gating only on wall clock:
    candidate count is a pure function of the fitted cells + probe
    width, immune to box load, and it is the quantity whose growth the
    gate exists to catch (fixed k → quadratic candidates). Returns
    ``(base, cands)`` — the deduped unit-vector table and the distinct
    (vec1 < vec2) candidate pairs; the caller adds the exact-cosine
    verify. The plan is byte-identical to the pre-factoring inline
    form (pure code motion — the declared query re-gates this round
    regardless, per the bit-identical-replan precedent)."""
    k = _embeddings_k(spark, sf_dir)
    base = (
        _vectors(spark, sf_dir)
        .groupBy("vec_id")  # barrier: probe/argmin expressions once
        .agg(F.first("v").alias("v"))
    )
    if k <= K_LITERAL_MAX:
        centroids = kmeans_fit(spark, sf_dir, k=k)
        # r16 (guide §2.4): no .distinct() here — the probe array is
        # the top-nprobe slice of the per-cell score structs, so each
        # cell id appears at most once per vector and (vec_id, probe)
        # rows are unique BY CONSTRUCTION; the distinct was a no-op
        # semantically but a real exchange + two HashAggregates per
        # self-join side in the plan (the join re-exchanges on probe
        # anyway). Output identical: the pair-level distinct below is
        # unchanged. The k > K_LITERAL_MAX table path keeps its
        # distinct (probe_via_table may emit duplicate probes).
        probed = base.withColumn(
            "probe",
            F.explode(_probe_cells_expr(centroids, SIMILAR_IVF_NPROBE)),
        ).select("vec_id", "probe")
    else:
        # k > K_LITERAL_MAX scale path (VERDICT r11 #2): probe the
        # learned cells via the centroid TABLE — no O(k) plan literal.
        # Never reached at gate/probe scale (k ≤ 78 there).
        centroids_df, coarse = kmeans_fit_table(spark, base, k)
        probed = probe_via_table(
            spark, base, centroids_df, coarse, SIMILAR_IVF_NPROBE
        ).distinct()
    # corpus × corpus self-join on the probe cell: pin SHUFFLE_HASH
    # (r10 audit, see dedup.dedup_ngram_jaccard)
    a, b = probed.alias("a").hint("shuffle_hash"), probed.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.probe") == F.col("b.probe"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec1"), F.col("b.vec_id").alias("vec2"))
        .distinct()
    )
    return base, cands


def embedding_similar_pairs_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similar pairs at the WEAK τ = 0.40 via learned-cell blocking —
    the production alternative to sign-LSH banding where wide hash
    keys collapse recall (SCALE.md band-key note: p≈0.63 per bit at
    this τ). BOTH sides multi-probe their ``SIMILAR_IVF_NPROBE``
    nearest k-means cells, so a pair becomes a candidate iff the
    probe sets intersect; the exact cosine verifies candidates only.

    Scale contract: candidates ∝ Σ_cells (P·|cell|)²; |cell| is held
    ~constant by growing k with the corpus (the SemDeDup adaptive-k
    rule — here k is the shared fixture fit), so the pair scan stays
    ~linear at fixed P, vs the banded form's N²/2^band_bits term.
    Recall (measured vs the exact all-pairs twin in
    tests/test_clustering.py) is the P knob, same as ann_ivf_topk's
    nprobe curve."""
    from .dedup import COSINE_SIMILAR_THRESHOLD

    base, cands = ivf_pair_candidates(spark, sf_dir)
    # r15 (guide §2.3 — move work off the pair rows): ‖v‖ is a pure
    # per-VECTOR quantity, but the old per-pair expression recomputed
    # both norms inside the verify join — three 64-dim folds per
    # candidate instead of one (927,928 candidates at sf0.1, measured;
    # the verify was 1.9 s of the 2.9 s execution). Computing
    # sqrt(dot(v, v)) once per vector is the IDENTICAL operation on
    # identical inputs, and the final expression keeps the exact
    # divide(dot, multiply(n1, n2)) tree — doubles are bit-identical
    # (A/B-hash-checked), so the oracle contract is untouched.
    based = base.withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    cos = dot(F.col("e1.v"), F.col("e2.v")) / (
        F.col("e1.nrm") * F.col("e2.nrm")
    )
    # Two fetch joins, SHUFFLE_HASH-pinned (C ≫ N regime — see
    # embedding_dedup's measured pair-fetch comparison)
    return (
        cands.join(
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


def embedding_similar_pairs_ivf_oracle(sf_dir: str) -> str:
    """DuckDB twin: both sides keep their SIMILAR_IVF_NPROBE nearest
    cells (same (s, cluster) ordering as the probe expression),
    candidate pairs share a probe cell, exact cosine mirrored
    term-for-term."""
    from ..session import active_or_local
    from .dedup import COSINE_SIMILAR_THRESHOLD

    spark = active_or_local("ivf_pairs_oracle")
    centroids = kmeans_fit(spark, sf_dir, k=_embeddings_k(spark, sf_dir))
    cos = (
        f"{dot_sql('e1.v', 'e2.v')} / "
        f"(sqrt({dot_sql('e1.v', 'e1.v')}) * sqrt({dot_sql('e2.v', 'e2.v')}))"
    )
    return f"""
WITH {_scored_ctes(centroids)},
ranked AS (
  SELECT vec_id, v, cluster,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cluster) AS rn
  FROM scored
),
probes AS (SELECT DISTINCT vec_id, cluster AS probe FROM ranked
           WHERE rn <= {SIMILAR_IVF_NPROBE}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec1, b.vec_id AS vec2
  FROM probes a JOIN probes b
    ON a.probe = b.probe AND a.vec_id < b.vec_id
)
SELECT vec1, vec2, {cos} AS cos_sim
FROM cand
JOIN vec e1 ON vec1 = e1.vec_id
JOIN vec e2 ON vec2 = e2.vec_id
WHERE {cos} >= {COSINE_SIMILAR_THRESHOLD}
"""


# The fit is iterative (multi-job), but assignment/search are pure
# projections/joins once centroids are fixed — so the oracles are
# lazy callables (sf_dir -> SQL) that run the fit and inline the
# centroids as literals. Resolved by registry.resolve_oracle.
QUERIES = {
    "kmeans_assign": (kmeans_assign, kmeans_assign_oracle),
    "ann_ivf_topk": (ann_ivf_topk, ann_ivf_topk_oracle),
    "ann_ivf_recall_at_k": (ann_ivf_recall_at_k, ann_ivf_recall_oracle),
    "embedding_similar_pairs_ivf": (
        embedding_similar_pairs_ivf,
        embedding_similar_pairs_ivf_oracle,
    ),
}
