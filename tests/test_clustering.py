"""k-means + IVF semantics and oracle parity (the fit is iterative,
but once centroids are fixed both declared queries are SQL-expressible
— their oracles inline the fitted centroids as literals), plus
relational3/4 parity."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from robin_sparkles_spark.operators import (
    clustering,
    relational3,
    relational4,
    relational5,
)
from robin_sparkles_spark.operators.similarity import ann_bruteforce_topk

from .oracle_utils import assert_query_matches_oracle

_R34 = {
    **relational3.QUERIES,
    **relational4.QUERIES_TAIL,
    **relational5.QUERIES_TAIL,
}


@pytest.mark.parametrize("name", sorted(_R34))
def test_relational3_oracle_parity(spark, sf_dir, name):
    fn, oracle = _R34[name]
    assert_query_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)


@pytest.mark.parametrize("name", sorted(clustering.QUERIES))
def test_clustering_oracle_parity(spark, sf_dir, name):
    """Hash parity against the centroid-literal DuckDB twin — the
    rows-only contract retired (VERDICT r02 ask #3). The lazy oracle
    resolves with the SAME memoized fit the Spark query uses; exact
    DECIMAL partial sums make the fit itself bit-reproducible, so the
    twin holds even when the oracle is generated in a fresh process."""
    fn, oracle = clustering.QUERIES[name]
    assert_query_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)


def test_kmeans_fit_reproducible_across_cache_clears(spark, sf_dir):
    """The cross-process determinism claim, tested in-process: clearing
    the memo cache and re-running the distributed fit must return
    bit-identical centroids (exact DECIMAL accumulation — double sums
    would drift with partition/merge order)."""
    c1 = clustering.kmeans_fit(spark, sf_dir)
    clustering._FIT_CACHE.clear()
    c2 = clustering.kmeans_fit(spark, sf_dir)
    assert c1 == c2


def test_kmeans_fit_codegen_parity(spark, sf_dir):
    """The fit runs with whole-stage codegen disabled (per-iteration
    centroid literals make JIT cost unamortizable); the interpreter
    and the generated code must evaluate the same expression tree to
    the same bits, or the centroid-literal oracles would depend on an
    execution mode. Pinned by refitting with codegen left ON."""
    c_off = clustering.kmeans_fit(spark, sf_dir)
    clustering._FIT_CACHE.clear()
    try:
        c_on = clustering.kmeans_fit(spark, sf_dir, disable_codegen=False)
    finally:
        # restore the memo's canonical entry for later tests directly —
        # c_off IS that entry; a third full fit would recompute it
        clustering._FIT_CACHE.clear()
        clustering._FIT_CACHE[
            (sf_dir, clustering.K_CLUSTERS, clustering.N_ITER)
        ] = c_off
    assert c_off == c_on


def test_kmeans_assign_complete_and_valid(spark, sf_dir):
    df = clustering.kmeans_assign(spark, sf_dir)
    rows = df.collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n_vecs                       # one row per vector
    assert len({r.vec_id for r in rows}) == n_vecs   # no dup assignment
    assert all(0 <= r.cluster < clustering.K_CLUSTERS for r in rows)
    # clusters should be non-degenerate: more than one in use
    assert df.select("cluster").distinct().count() > 1


def test_kmeans_iterations_reduce_inertia(spark, sf_dir):
    from robin_sparkles_spark.operators.clustering import (
        _assign_expr,
        _vectors,
        kmeans_fit,
    )

    def inertia(centroids):
        vecs = _vectors(spark, sf_dir).withColumn("cluster", _assign_expr(centroids))
        dim = len(centroids[0])
        dist = None
        for i, c in enumerate(centroids):
            d = sum(
                (F.element_at("v", j + 1) - float(c[j])) ** 2 for j in range(dim)
            )
            dist = d if dist is None else F.when(F.col("cluster") == i, d).otherwise(dist)
        return vecs.select(F.sum(dist).alias("s")).collect()[0].s

    c1 = kmeans_fit(spark, sf_dir, n_iter=1)
    c5 = kmeans_fit(spark, sf_dir, n_iter=5)
    assert inertia(c5) <= inertia(c1) + 1e-9


def test_ivf_subset_of_bruteforce_space(spark, sf_dir):
    """IVF scores must agree exactly with brute force on shared
    (query, neighbor) pairs; recall is partial by design (bounded
    nprobe)."""
    bf = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in ann_bruteforce_topk(spark, sf_dir).collect()
    }
    ivf_rows = clustering.ann_ivf_topk(spark, sf_dir).collect()
    assert ivf_rows
    shared = 0
    for r in ivf_rows:
        key = (r.query_id, r.neighbor_id)
        if key in bf:
            shared += 1
            assert abs(bf[key] - r.cos_sim) < 1e-12
    assert shared > 0  # data-adaptive cells recover some true neighbors


def test_ivf_multiprobe_recall_is_monotone(spark, sf_dir):
    """Probing more cells can only widen the candidate set, so
    recall@k vs the exact baseline must not decrease with nprobe —
    the IVF recall/cost knob doing its job."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in ann_bruteforce_topk(spark, sf_dir).collect()
    }
    r1 = {
        (r.query_id, r.neighbor_id)
        for r in clustering._ivf_topk(spark, sf_dir, 1).collect()
    }
    r2 = {
        (r.query_id, r.neighbor_id)
        for r in clustering._ivf_topk(spark, sf_dir, 2).collect()
    }
    assert len(bf & r2) >= len(bf & r1) > 0


def test_q22_urgent_antijoin_is_not_vacuous(spark, sf_dir):
    """The anti-join must actually exclude customers (ADVICE r02: a
    bare 'URGENT' literal matched no fixture order, so the filter was
    dead code — fixture priorities are '1-URGENT'..'5-LOW')."""
    from robin_sparkles_spark.sources import load_table

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thresh_row = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
        .collect()[0]
    )
    above = c.where(F.col("c_acctbal") > thresh_row.avg_bal).count()
    kept = (
        relational4.q22_idle_balance_by_segment(spark, sf_dir)
        .agg(F.sum("n_customers").alias("n"))
        .collect()[0]
        .n
    )
    assert o.where(F.col("o_orderpriority") == "1-URGENT").count() > 0
    assert 0 < kept < above  # anti-join excluded someone


def test_gapfill_produces_contiguous_calendar(spark, sf_dir):
    """The month scaffold must be contiguous from min to max month,
    with zero rows for months the thin slice skips (36 such months on
    the smallest fixture) — the gap-fill actually filling gaps."""
    rows = sorted(
        relational4.orders_monthly_gapfill(spark, sf_dir).collect(),
        key=lambda r: r.month,
    )
    months = [r.month for r in rows]
    y0, m0 = map(int, months[0].split("-"))
    expect = []
    y, m = y0, m0
    for _ in months:
        expect.append(f"{y:04d}-{m:02d}")
        m += 1
        if m == 13:
            y, m = y + 1, 1
    assert months == expect  # contiguous, no dup/missing months
    for r in rows:
        assert (r.n_orders == 0) == (r.revenue == 0.0)


def test_ivf_similar_pairs_recall_beats_banding(spark, sf_dir):
    """The IVF-blocked weak-τ pair finder (r8): ≥0.75 recall of the
    exact all-pairs truth AND at least the banded form's recall at
    the same τ — learned cells concentrate moderate-cosine neighbors
    where fixed sign-bands cannot (measured 0.82–0.86 vs 0.61–0.65
    across fixture scales)."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.functions.vectors import dot
    from robin_sparkles_spark.operators import clustering as C
    from robin_sparkles_spark.operators.dedup import (
        COSINE_SIMILAR_THRESHOLD,
        embedding_similar_pairs,
    )

    base = C._vectors(spark, sf_dir).groupBy("vec_id").agg(
        F.first("v").alias("v")
    )
    a, b = base.alias("a"), base.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(dot(F.col("a.v"), F.col("a.v")))
        * F.sqrt(dot(F.col("b.v"), F.col("b.v")))
    )
    truth = {
        (r.vec1, r.vec2)
        for r in a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec1"),
            F.col("b.vec_id").alias("vec2"),
            cos.alias("cs"),
        )
        .where(F.col("cs") >= COSINE_SIMILAR_THRESHOLD)
        .collect()
    }
    assert truth
    ivf = {
        (r.vec1, r.vec2)
        for r in C.embedding_similar_pairs_ivf(spark, sf_dir).collect()
    }
    banded = {
        (r.vec1, r.vec2)
        for r in embedding_similar_pairs(spark, sf_dir).collect()
    }
    assert ivf <= truth  # exact verify: no false positives
    recall_ivf = len(ivf & truth) / len(truth)
    recall_banded = len(banded & truth) / len(truth)
    assert recall_ivf >= 0.75, (recall_ivf, len(truth))
    assert recall_ivf >= recall_banded, (recall_ivf, recall_banded)


def test_ivf_similar_pairs_plan_is_equi_join(spark, sf_dir):
    """The probe-cell candidate join must be a hash/sort-merge EQUI
    join — no nested-loop pair scan."""
    from robin_sparkles_spark.operators import clustering as C

    from .test_plans import audit_plan

    a = audit_plan(C.embedding_similar_pairs_ivf(spark, sf_dir))
    assert a.sortmerge_joins + a.broadcast_joins + a.shuffled_hash_joins >= 1, a.formatted
    assert not a.has_python_eval


def test_pq_rerank_restores_recall(spark, sf_dir):
    """The PQ pipeline's recall ladder: the exact re-rank of the ADC
    shortlist must dominate the raw ADC order, and the shipped
    (M=16, Ks=16, R=100) point must clear a 0.85 floor at gate scales
    (measured 0.974 @ sf0.01, 0.896 @ sf0.1; raw ADC ~0.35/0.25 —
    re-ranking is what makes the compressed index usable)."""
    from robin_sparkles_spark.operators import pq as P
    from robin_sparkles_spark.operators.similarity import TOP_K, build_exact_topk

    bf = {
        (r.query_id, r.neighbor_id)
        for r in spark.read.parquet(build_exact_topk(spark, sf_dir)).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in P.pq_adc_topk(spark, sf_dir).collect()
    }
    rr = {
        (r.query_id, r.neighbor_id)
        for r in P.pq_rerank_topk(spark, sf_dir).collect()
    }
    recall_adc = len(adc & bf) / len(bf)
    recall_rr = len(rr & bf) / len(bf)
    assert recall_rr >= recall_adc, (recall_rr, recall_adc)
    assert recall_rr >= 0.85, recall_rr
    row = P.pq_recall_at_k(spark, sf_dir).collect()[0]
    assert row.hits == len(rr & bf)


def test_pq_packed_codes_are_nibbles(spark, sf_dir):
    """Every packed word holds 8 valid 4-bit codes (0..15) and the
    codebooks are the memoized deterministic fit (two calls, same
    literals)."""
    from robin_sparkles_spark.operators import pq as P

    rows = P.pq_encode(spark, sf_dir).collect()
    assert len(rows) == len({r.vec_id for r in rows})
    for r in rows[:50]:
        assert 0 <= r.code_lo < (1 << 32) and 0 <= r.code_hi < (1 << 32)
    assert P.pq_fit(spark, sf_dir) == P.pq_fit(spark, sf_dir)


def test_ivfpq_is_equi_join_and_overlaps_truth(spark, sf_dir):
    """The IVFADC+R composition: plan is equi-joins (no nested-loop
    pair scan — the difference from the sanctioned bounded-Q
    `pq_adc_topk`), and its recall vs the exact fixture sits between
    nothing and the re-rank ceiling (bounded by the nprobe=2 coarse
    probe, same dial as `ann_ivf_topk`)."""
    from robin_sparkles_spark.operators import pq as P
    from robin_sparkles_spark.operators.similarity import build_exact_topk

    from .test_plans import audit_plan

    df = P.ann_ivfpq_topk(spark, sf_dir)
    a = audit_plan(df)
    assert a.bnl_joins == 0, a.formatted
    assert a.sortmerge_joins + a.broadcast_joins + a.shuffled_hash_joins >= 1, a.formatted

    bf = {
        (r.query_id, r.neighbor_id)
        for r in spark.read.parquet(build_exact_topk(spark, sf_dir)).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in df.collect()}
    recall = len(got & bf) / len(bf)
    assert 0.3 <= recall <= 1.0, recall
    rr = {
        (r.query_id, r.neighbor_id)
        for r in P.pq_rerank_topk(spark, sf_dir).collect()
    }
    assert recall <= len(rr & bf) / len(bf) + 1e-9  # probe-bounded


def test_opq_rotation_is_orthogonal_and_deterministic(spark, sf_dir):
    """R must be orthogonal (RᵀR = I — the rotation preserves norms,
    so the rotated index stays unit and every PQ invariant holds) and
    the memoized fit must return the identical literals."""
    import numpy as np

    from robin_sparkles_spark.operators import opq as O

    R = np.array(O.opq_fit(spark, sf_dir))
    assert R.shape == (O.DIM, O.DIM)
    assert np.allclose(R.T @ R, np.eye(O.DIM), atol=1e-9)
    assert O.opq_fit(spark, sf_dir) == O.opq_fit(spark, sf_dir)


def test_opq_recall_ab_vs_plain_pq(spark, sf_dir):
    """The point of OPQ: at the IDENTICAL (M, Ks, shortlist) 8-byte
    budget, the learned rotation must not lose recall vs plain PQ
    (measured GAIN: 0.974→0.988 @ sf0.01, 0.896→0.918 @ sf0.1 —
    recorded in BASELINE.md)."""
    from robin_sparkles_spark.operators import opq as O
    from robin_sparkles_spark.operators import pq as P

    pq_row = P.pq_recall_at_k(spark, sf_dir).collect()[0]
    opq_row = O.opq_recall_at_k(spark, sf_dir).collect()[0]
    assert (opq_row.k, opq_row.m, opq_row.ks, opq_row.shortlist) == (
        pq_row.k, pq_row.m, pq_row.ks, pq_row.shortlist,
    )  # same budget
    assert opq_row.recall_at_k >= pq_row.recall_at_k, (
        opq_row.recall_at_k, pq_row.recall_at_k,
    )


def test_opq_ivfpq_composition_recall_ab(spark, sf_dir):
    """The full production composition (OPQ rotation → coarse probe →
    ADC-in-cell → exact re-rank) must not lose recall vs plain IVFPQ
    at the identical (nprobe, shortlist, 8-byte) budget — gains are
    probe-bounded (nprobe=2 dominates), measured 0.520→0.528 @ sf0.01,
    0.476→0.478 @ sf0.1."""
    from robin_sparkles_spark.operators import opq as O
    from robin_sparkles_spark.operators import pq as P

    a = P.ann_ivfpq_recall_at_k(spark, sf_dir).collect()[0]
    b = O.ann_opq_ivfpq_recall_at_k(spark, sf_dir).collect()[0]
    assert (b.k, b.nprobe, b.shortlist) == (a.k, a.nprobe, a.shortlist)
    assert b.recall_at_k >= a.recall_at_k - 1e-9, (
        b.recall_at_k, a.recall_at_k,
    )


# --- centroid-TABLE join assignment (k > K_LITERAL_MAX scale path, r12) ------


def _table_fixture(spark, sf_dir, k):
    """Shared pieces: cast vectors, a k-wide literal ground-truth fit,
    and a coarse quantizer — k kept ≤ K_LITERAL_MAX so the literal
    path stays runnable as the exact reference."""
    from robin_sparkles_spark.operators import clustering as C

    vecs = C._vectors(spark, sf_dir)
    lit = C._fit_literal(spark, vecs, k, C.N_ITER)
    coarse = C._fit_literal(spark, vecs, C.COARSE_K, C.N_ITER)
    return C, vecs, lit, coarse


def test_table_fit_full_probe_matches_literal_bitwise(spark, sf_dir):
    """VERDICT r11 #2 parity pin: with nprobe = COARSE_K (every
    centroid reachable) the join-form fit runs the IDENTICAL IEEE
    operation sequence as the literal fit — decimal partial sums,
    decimal→double cast, double division, (s, cluster) first-wins
    argmin — so centroids AND assignments must be bit-identical."""
    from robin_sparkles_spark.operators import clustering as C

    k = 32
    vecs = C._vectors(spark, sf_dir)
    lit = C._fit_literal(spark, vecs, k, C.N_ITER)
    cdf, coarse = C.kmeans_fit_table(spark, vecs, k, nprobe=C.COARSE_K)
    got = {r.cluster: list(r.c) for r in cdf.collect()}
    assert sorted(got) == list(range(k))
    for i, c in enumerate(lit):
        assert got[i] == list(map(float, c)), f"centroid {i} differs"
    exact = {
        r.vec_id: r.cluster
        for r in vecs.withColumn("cluster", C._assign_expr(lit)).collect()
    }
    via_table = {
        r.vec_id: r.cluster
        for r in C.assign_via_table(
            spark, vecs, cdf, coarse, nprobe=C.COARSE_K
        ).collect()
    }
    assert via_table == exact


def test_table_assign_default_probe_recall(spark, sf_dir):
    """At the default probe width the join form is approximate — the
    production regime has k ≫ COARSE_K so every coarse cell holds
    ~k/COARSE_K centroids and coverage is structural; this fixture
    (k=32 over 64 cells) is the ADVERSARIAL shape for it. Gate the
    measured floor: near-total coverage and high true-nearest rate."""
    C, vecs, lit, coarse = _table_fixture(spark, sf_dir, 32)
    cdf = spark.createDataFrame(
        [(i, list(map(float, c))) for i, c in enumerate(lit)],
        "cluster int, c array<double>",
    )
    exact = {
        r.vec_id: r.cluster
        for r in vecs.withColumn("cluster", C._assign_expr(lit)).collect()
    }
    approx = {
        r.vec_id: r.cluster
        for r in C.assign_via_table(spark, vecs, cdf, coarse).collect()
    }
    coverage = len(approx) / len(exact)
    hits = sum(approx.get(v) == c for v, c in exact.items()) / len(exact)
    assert coverage >= 0.95, coverage
    assert hits >= 0.80, hits


def test_table_assign_plan_carries_no_k_sized_literal(spark, sf_dir):
    """The machine check for 'no O(k) literal ships past the
    threshold': (a) the literal argmin REFUSES k > K_LITERAL_MAX;
    (b) the join-form plan string is k-invariant — its size is
    dominated by the constant COARSE_K quantizer literal and does not
    grow when the centroid table quadruples."""
    import pytest as _pytest

    from robin_sparkles_spark.operators import clustering as C
    from robin_sparkles_spark.plans.audit import audit_plan

    with _pytest.raises(ValueError, match="K_LITERAL_MAX"):
        C._assign_expr([[0.0] * 4] * (C.K_LITERAL_MAX + 1))

    vecs = C._vectors(spark, sf_dir)
    coarse = C._fit_literal(spark, vecs, C.COARSE_K, 1)

    def synth_centroids(k):
        return spark.range(k).selectExpr(
            "cast(id as int) as cluster",
            "transform(sequence(1, 64), i -> cast(id * i as double)) as c",
        )

    plans = {}
    for k in (300, 1200):
        df = C.assign_via_table(spark, vecs, synth_centroids(k), coarse)
        plans[k] = audit_plan(df).formatted
    assert abs(len(plans[300]) - len(plans[1200])) < 2_000, (
        len(plans[300]),
        len(plans[1200]),
    )
    # and the k=1200 plan is far below what a 1200×64 literal would be
    # (~2M chars of CAST('...' AS DOUBLE) alone)
    assert len(plans[1200]) < 1_000_000


def test_semdedup_dispatches_to_table_path_above_threshold(spark, sf_dir):
    """Force the k > K_LITERAL_MAX branch in semdedup's assigned index
    (prime the k cache, drop the memoized index) and check the full
    declared query still runs end-to-end on the table path with a
    sane drop report — the 100×-scale plan, executed."""
    from robin_sparkles_spark.operators import semdedup as S

    key = None
    try:
        S._K_CACHE[sf_dir] = S.K_LITERAL_MAX + 8
        key = (spark.sparkContext.applicationId, sf_dir)
        saved = S._ASSIGNED_CACHE.pop(key, None)
        out = S.semdedup_dropped(spark, sf_dir).collect()
        assert out, "planted corpus must still yield drops"
        for r in out:
            assert r.representative < r.vec_id
            assert r.n_dup_partners >= 1
    finally:
        S._K_CACHE.pop(sf_dir, None)
        S._ASSIGNED_CACHE.pop(key, None)
        if saved is not None:
            S._ASSIGNED_CACHE[key] = saved


def test_fit_training_sample_identity_below_cap(spark, sf_dir):
    """At every gated/benched SF the corpus sits under the
    SAMPLE_PER_CENTROID·k cap, so the sampled-fit law (VERDICT r13 #3)
    must be a no-op there: the training set is the whole corpus and
    fitted centroids are bit-identical to the pre-sampling fit."""
    from robin_sparkles_spark.operators import clustering as C

    vecs = C._vectors(spark, sf_dir)
    n = vecs.count()
    assert n <= C.SAMPLE_PER_CENTROID * C.K_CLUSTERS
    train = C._fit_training_sample(spark, vecs, C.K_CLUSTERS)
    assert train.count() == n


def test_fit_training_sample_bounded_and_deterministic(spark, sf_dir):
    """Forced past the cap (tiny per_centroid), the sample must be
    (a) bounded near the cap, (b) deterministic — two draws identical
    (the oracle re-derives the fit in another process, so the sample
    predicate must be engine-state-free)."""
    from robin_sparkles_spark.operators import clustering as C

    vecs = C._vectors(spark, sf_dir)
    n = vecs.count()
    cap = 16 * C.K_CLUSTERS  # 128 < fixture 500
    assert cap < n
    s1 = C._fit_training_sample(spark, vecs, C.K_CLUSTERS, per_centroid=16)
    s2 = C._fit_training_sample(spark, vecs, C.K_CLUSTERS, per_centroid=16)
    ids1 = sorted(r.vec_id for r in s1.select("vec_id").collect())
    ids2 = sorted(r.vec_id for r in s2.select("vec_id").collect())
    assert ids1 == ids2
    assert 0 < len(ids1) < n
    assert 0.5 * cap <= len(ids1) <= 1.5 * cap


def test_sampled_fit_inertia_gate(spark, sf_dir):
    """VERDICT r13 #3 quality gate: a fit trained on the bounded hash
    sample must cluster the FULL corpus nearly as well as the
    full-corpus fit — full-corpus inertia within 25% (the measured
    fixture gap is ~a few %; 1.25 is the regression ceiling, not the
    expectation)."""
    from robin_sparkles_spark.operators import clustering as C

    vecs = C._vectors(spark, sf_dir)

    def inertia(centroids):
        assigned = vecs.withColumn("cluster", C._assign_expr(centroids))
        dim = len(centroids[0])
        dist = None
        for i, c in enumerate(centroids):
            d = sum(
                (F.element_at("v", j + 1) - float(c[j])) ** 2
                for j in range(dim)
            )
            dist = (
                d
                if dist is None
                else F.when(F.col("cluster") == i, d).otherwise(dist)
            )
        return assigned.select(F.sum(dist).alias("s")).collect()[0].s

    full = C._fit_literal(spark, vecs, C.K_CLUSTERS, C.N_ITER)
    sample = C._fit_training_sample(
        spark, vecs, C.K_CLUSTERS, per_centroid=16
    )
    sampled = C._fit_literal(spark, sample, C.K_CLUSTERS, C.N_ITER)
    i_full = inertia(full)
    i_sampled = inertia(sampled)
    assert i_sampled <= 1.25 * i_full, (i_sampled, i_full)


def test_nested_salted_sample_composes(spark, sf_dir):
    """ADVICE r14: a nested sample drawn FROM a sample must be salted.
    The inner draw keeps rows with pmod(xxhash64(vec_id), D) < t1, so
    an unsalted second draw's threshold t2 (computed from the inner
    count as if hashes were uniform on [0, D)) under-filters —
    whenever t2 >= t1 it keeps EVERYTHING. The salted draw is
    independent, so the nested fraction concentrates at its own cap.
    This pins the coarse-quantizer cost bound in kmeans_fit_table."""
    from robin_sparkles_spark.operators import clustering as C

    vecs = C._vectors(spark, sf_dir)
    n = vecs.count()
    k = C.K_CLUSTERS
    outer = C._fit_training_sample(spark, vecs, k, per_centroid=16)
    n_outer = outer.count()
    assert 16 * k < n  # outer really sampled
    # nested UNsalted draw at a cap half the outer count: t2 > t1
    # (cap2/n_outer > cap1/n since cap2 = n_outer/2 >= cap1*n_outer/n),
    # so it degenerates to identity — the failure mode being fixed
    inner_cap_pc = max(1, (n_outer // 2) // k)
    unsalted = C._fit_training_sample(spark, outer, k, per_centroid=inner_cap_pc)
    assert unsalted.count() == n_outer  # demonstrates the under-filter
    salted = C._fit_training_sample(
        spark, outer, k, per_centroid=inner_cap_pc, salt=1
    )
    n_salted = salted.count()
    cap2 = inner_cap_pc * k
    assert n_salted < n_outer
    assert 0.4 * cap2 <= n_salted <= 1.8 * cap2, (n_salted, cap2, n_outer)
    # determinism across draws (oracle re-derives in another process)
    assert n_salted == C._fit_training_sample(
        spark, outer, k, per_centroid=inner_cap_pc, salt=1
    ).count()
