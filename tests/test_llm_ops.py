"""Oracle parity + semantic checks for the LLM-pipeline operator
families (text analysis, dedup, similarity)."""

from __future__ import annotations

import pytest

from robin_sparkles_spark.operators import (
    bpe,
    c4_filters,
    curation,
    dedup,
    embedding_dedup,
    graph,
    ngram_lm,
    opq,
    pq,
    semdedup,
    similarity,
    sketches,
    text_analysis,
    web_text,
)

from .oracle_utils import assert_query_matches_oracle

ALL = {}
for mod in (text_analysis, dedup, embedding_dedup, similarity, curation, sketches, graph, semdedup, bpe, web_text, ngram_lm, pq, opq, c4_filters):
    ALL.update(mod.QUERIES)
    ALL.update(getattr(mod, "QUERIES_TAIL", {}))


@pytest.mark.parametrize("name", sorted(ALL))
def test_oracle_parity(spark, sf_dir, name):
    fn, oracle = ALL[name]
    assert_query_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)


def test_pagerank_mass_and_ordering(spark, sf_dir):
    """PageRank sanity: on this undirected graph total mass stays ~1
    through damped iterations, the top list is rank-sorted with the
    deterministic tie-break, and both node types appear (bipartite
    graph — suppliers aggregate many customers' mass and customers
    outnumber suppliers)."""
    rows = graph.pagerank_trade_graph(spark, sf_dir).collect()
    assert len(rows) == graph.PAGERANK_TOP_N
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r.rank > 0 for r in rows)
    assert {r.node_type for r in rows} <= {"customer", "supplier"}
    assert "supplier" in {r.node_type for r in rows}


def test_typo_blocking_is_exhaustive(spark, sf_dir):
    """The deletion-neighborhood blocking must find EXACTLY the pairs
    a quadratic levenshtein scan finds (FastSS k=1 is exact, not
    approximate) — and the planted twins guarantee non-vacuity."""
    from pyspark.sql import functions as F
    from robin_sparkles_spark.sources import load_table

    blocked = {
        (r.t1, r.t2)
        for r in text_analysis.vocab_typo_pairs(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"))
        .where(F.col("w") != "")
        .distinct()
    )
    terms = words.union(
        words.select(F.concat(F.substring("w", 1, 1), F.col("w")).alias("w"))
    ).distinct()
    a, b = terms.alias("a"), terms.alias("b")
    brute = {
        (r.t1, r.t2)
        for r in a.join(F.broadcast(b), F.col("a.w") < F.col("b.w"))
        .select(F.col("a.w").alias("t1"), F.col("b.w").alias("t2"))
        .where(F.levenshtein("t1", "t2") <= 1)
        .collect()
    }
    assert blocked == brute
    assert blocked  # planted twins make it non-vacuous


def test_quantile_sketch_accuracy(spark, sf_dir):
    """The 256-row hash-sample quantile estimates must land near the
    exact quantiles (binomial rank error ~ q(1-q)/sqrt(K) of the rank
    range → well under 20% relative on this price distribution), and
    every reported rel_error must be consistent with its columns."""
    rows = sketches.orders_quantile_sketch(spark, sf_dir).collect()
    assert {r.q for r in rows} == set(sketches.QSKETCH_QS)
    for r in rows:
        assert r.rel_error == abs(r.estimate - r.exact) / r.exact
        assert r.rel_error < 0.2, (r.q, r.estimate, r.exact)


def test_countmin_never_undercounts(spark, sf_dir):
    """Count-min's one-sided error: estimate ≥ exact for every probed
    user (collisions only add), and the probe set is exactly the
    CM_PROBE_N most active users."""
    from robin_sparkles_spark.sources import load_table

    rows = sketches.events_countmin_users(spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert len(rows) == min(sketches.CM_PROBE_N, n_users)
    for r in rows:
        assert r.cm_estimate >= r.exact_n
        assert r.overcount == r.cm_estimate - r.exact_n


def test_decontaminate_train_separates_both_classes(spark, sf_dir):
    """The contamination flag must be non-vacuous in BOTH directions:
    some train docs share ≥2 shingles with the eval slice (shared
    vocabulary + planted near-dups guarantee overlap), and some are
    clean — and no eval doc may appear in the output."""
    rows = curation.decontaminate_train(spark, sf_dir).collect()
    assert all(r.doc_id % curation.EVAL_MOD != curation.EVAL_REM for r in rows)
    flags = {r.contaminated for r in rows}
    assert flags == {True, False}, f"vacuous contamination split: {flags}"
    for r in rows:
        assert r.contaminated == (r.n_shared >= curation.CONTAM_MIN_SHARED)


def test_scrub_pii_docs_every_class_nonvacuous(spark, sf_dir):
    """The declared PII scrub must exercise every pattern class with
    nonzero counts (the injection's whole point — VERDICT r02 ask #5)
    and leave no redactable residue in clean_text."""
    from pyspark.sql import functions as F

    df = text_analysis.scrub_pii_docs(spark, sf_dir)
    totals = df.agg(
        *[F.sum(f"n_{n}").alias(n) for n, _, _ in text_analysis.PII_PATTERNS]
    ).collect()[0]
    for name, _, _ in text_analysis.PII_PATTERNS:
        assert totals[name] > 0, f"pattern class {name} is vacuous"
    residue = df.where(
        F.col("clean_text").rlike("@mail\\.example\\.com|https://docs\\.example")
    ).count()
    assert residue == 0


def test_embedding_dedup_finds_exactly_planted_pairs(spark, sf_dir):
    """At the real threshold (cos ≥ 0.9) the banded dedup must return
    EXACTLY the planted pair set: recall 1.0 (per-pair banding miss
    probability ~1e-10 at planted cosine ≈ 0.999) and zero false
    positives (organic max cosine ~0.51 — separation on both sides).
    Also checks every planted cosine clears the guaranteed bound
    (1−r)/(1+r) = 0.923 for r = 0.04."""
    rows = embedding_dedup.embedding_dedup(spark, sf_dir).collect()
    want = {
        (i, i + embedding_dedup.NEARDUP_ID_OFFSET)
        for i in range(embedding_dedup.NEARDUP_N)
    }
    assert {(r.vec1, r.vec2) for r in rows} == want
    assert all(r.cos_sim >= 0.923 for r in rows)


def test_minhash_recall_vs_bruteforce(spark, sf_dir):
    """LSH candidates must recover every true Jaccard≥τ pair on the
    fixture corpus (16 perms, 4×4 banding ⇒ P[miss | j≥0.8] < 1e-3)."""
    truth = {
        (r.doc1, r.doc2) for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    lsh = {(r.doc1, r.doc2) for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()}
    assert truth, "fixture corpus should contain planted near-dups"
    assert lsh == truth  # verified pairs: no false positives by construction


def test_simhash_finds_planted_dups(spark, sf_dir):
    """SimHash is approximate: with 31 informative bits (features are
    mod 2³¹−1) a short doc's J≥0.8 twin can land past hamming 5
    (measured: 27/28 at one SF, 25/25 at another; the one miss is a
    ~30-shingle doc whose 2 differing shingles flipped 7 bits). Assert
    ≥90% recall of the exact-Jaccard truth, and that the threshold
    keeps noise bounded — at hamming 6-7 noise is ~10× truth, so a
    recall-1.0 threshold would drown the signal."""
    truth = {
        (r.doc1, r.doc2) for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    sh = {(r.doc1, r.doc2) for r in dedup.dedup_simhash(spark, sf_dir).collect()}
    assert truth, "fixture corpus should contain planted near-dups"
    assert len(truth & sh) >= 0.9 * len(truth)
    # and it shouldn't drown them in noise (measured: ≤ ~2× truth)
    assert len(sh) <= max(4 * len(truth), 60)


def test_ann_lsh_is_subset_of_bruteforce_space(spark, sf_dir):
    """Sign-LSH returns same-bucket neighbors only; each of its
    results must score identically to brute force (bit-exact cosine
    join consistency)."""
    bf = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in similarity.ann_bruteforce_topk(spark, sf_dir).collect()
    }
    lsh_rows = similarity.ann_lsh_topk(spark, sf_dir).collect()
    assert lsh_rows
    agree = [
        (q, n) for (q, n, s) in ((r.query_id, r.neighbor_id, r.cos_sim) for r in lsh_rows)
        if (q, n) in bf
    ]
    for r in lsh_rows:
        if (r.query_id, r.neighbor_id) in bf:
            assert bf[(r.query_id, r.neighbor_id)] == r.cos_sim
    # sanity: buckets shouldn't be empty — some overlap with exact top-k
    assert agree


def test_ngram_inverted_index_matches_bruteforce(spark, sf_dir):
    """The declared inverted-index Jaccard join is EXACT: identical
    pairs and bit-identical jaccard values vs the all-pairs scan
    (shared/(|A|+|B|-shared) vs |A∩B|/|A∪B| divide the same ints)."""
    fast = {
        (r.doc1, r.doc2, r.jaccard)
        for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    truth = {
        (r.doc1, r.doc2, r.jaccard)
        for r in dedup.dedup_ngram_jaccard_bruteforce(spark, sf_dir).collect()
    }
    assert truth
    assert fast == truth


def test_simhash_blocked_matches_bruteforce(spark, sf_dir):
    """Pigeonhole chunk-blocking is EXACT for hamming ≤ k: the blocked
    equi-join must return the same pair set as the all-pairs scan."""
    fast = {
        (r.doc1, r.doc2, r.hamming)
        for r in dedup.dedup_simhash(spark, sf_dir).collect()
    }
    truth = {
        (r.doc1, r.doc2, r.hamming)
        for r in dedup.dedup_simhash_bruteforce(spark, sf_dir).collect()
    }
    assert truth
    assert fast == truth


def test_embedding_bucketed_subset_and_recall(spark, sf_dir):
    """Sign-LSH-bucketed similar pairs ⊆ all-pairs ground truth, with
    bit-identical cosines; recall on this corpus stays useful (the
    8-bit bucket keeps ≥ ~25% of true τ-pairs; exact recall is
    corpus-dependent — the declared contract is the bucketed one)."""
    truth = {
        (r.vec1, r.vec2): r.cos_sim
        for r in dedup.embedding_cosine_pairs_bruteforce(spark, sf_dir).collect()
    }
    got = {
        (r.vec1, r.vec2): r.cos_sim
        for r in dedup.embedding_similar_pairs(spark, sf_dir).collect()
    }
    assert truth, "threshold should be non-vacuous on this corpus"
    assert got, "bucketed query must return rows at every gate SF"
    assert set(got) <= set(truth)
    for pair, cos in got.items():
        assert truth[pair] == cos
    assert len(got) >= max(1, len(truth) // 4)


def test_dedup_groups_match_union_find(spark, sf_dir):
    """Connected-components labels must equal a driver-side union-find
    over the same LSH pair graph (min-id canonical convention), with
    consistent sizes and keep-flags."""
    pairs = [
        (r.doc1, r.doc2) for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min id becomes the root

    rows = dedup.dedup_groups(spark, sf_dir).collect()
    assert len(rows) == 500 and len({r.doc_id for r in rows}) == 500
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r.group_id] = sizes.get(r.group_id, 0) + 1
    for r in rows:
        assert r.group_id == (find(r.doc_id) if r.doc_id in parent else r.doc_id)
        assert r.group_size == sizes[r.group_id]
        assert r.is_canonical == (r.doc_id == r.group_id)
    assert any(r.group_size >= 2 for r in rows), "planted dups must cluster"


def test_incremental_consistent_with_full_lsh(spark, sf_dir):
    """Incremental new-vs-corpus dedup must agree with the full
    self-join: a new-batch doc is a dup iff some full-LSH pair links
    it to a corpus doc, and its best-match jaccard is the max over
    those partners (same bands, same verify — only the pair universe
    is restricted)."""
    pairs = [
        (r.doc1, r.doc2, r.jaccard)
        for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    ]
    is_new = lambda d: d % 5 == 4
    partners: dict[int, list[tuple[int, float]]] = {}
    for a, b, j in pairs:
        for new, corp in ((a, b), (b, a)):
            if is_new(new) and not is_new(corp):
                partners.setdefault(new, []).append((corp, j))
    rows = {r.doc_id: r for r in curation.dedup_incremental(spark, sf_dir).collect()}
    assert all(is_new(d) for d in rows)
    for d, r in rows.items():
        if d in partners:
            best_j = max(j for _, j in partners[d])
            best_c = min(c for c, j in partners[d] if j == best_j)
            assert r.is_dup and r.dup_of == best_c and r.jaccard == best_j
        else:
            assert (not r.is_dup) and r.dup_of == -1 and r.jaccard == 0.0
    assert any(r.is_dup for r in rows.values()), "planted dups must straddle the split"


def test_curation_pipeline_is_component_intersection(spark, sf_dir):
    """The composite keep-set must equal the intersection computed
    from its component operators independently."""
    canonical = {
        r.doc_id: r.group_size
        for r in dedup.dedup_groups(spark, sf_dir).collect()
        if r.is_canonical
    }
    good = {
        r.doc_id: r.quality_score
        for r in text_analysis.text_quality(spark, sf_dir).collect()
        if r.quality_score >= curation.QUALITY_FLOOR
    }
    rows = curation.curation_pipeline(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == set(canonical) & set(good)
    for r in rows:
        assert r.group_size == canonical[r.doc_id]
        assert r.quality_score == good[r.doc_id]
        assert 0 <= r.sample_bucket < 100
    assert rows and len(rows) < 500, "filter must be selective but non-vacuous"


def test_kmv_estimator_branches_and_error(spark, sf_dir):
    """Small groups short-circuit to exact (k_used < K ⇒ error 0);
    estimator-path groups must land within the KMV standard error
    (~1/√(K−2) ≈ 18% at K=32; assert a loose 3σ bound)."""
    rows = sketches.users_kmv_by_type(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.exact_users < sketches.SKETCH_K:
            assert r.kmv_estimate == float(r.exact_users) and r.rel_error == 0.0
        else:
            assert r.rel_error <= 0.55


def test_scrub_pii_redacts_planted_patterns(spark):
    """PII scrub on a staged corpus with planted emails/URLs/phones/IDs:
    counts match plants, clean text carries the tokens, and a
    PII-free doc passes through byte-identical."""
    rows = [
        (1, "contact bob@example.com or alice@corp.io for details"),
        (2, "see https://example.com/x?y=1 and call +1 (555) 123-4567"),
        (3, "account 12345678 is overdue"),
        (4, "a perfectly clean sentence"),
        (5, "mixed: eve@x.org at http://e.org id 99887766"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in text_analysis.scrub_pii(df).collect()}
    assert got[1].n_email == 2 and "<EMAIL>" in got[1].clean_text
    assert "bob@example.com" not in got[1].clean_text
    assert got[2].n_url == 1 and got[2].n_phone == 1
    assert "<URL>" in got[2].clean_text and "<PHONE>" in got[2].clean_text
    assert got[3].n_id_number == 1 and "<ID>" in got[3].clean_text
    assert got[4].clean_text == got[4].text
    assert all(
        getattr(got[4], f"n_{n}") == 0 for n, _, _ in text_analysis.PII_PATTERNS
    )
    # an email's digits must not double-count as phone/id
    assert got[5].n_email == 1 and got[5].n_url == 1 and got[5].n_id_number == 1
    assert got[5].n_phone == 0


def test_exact_dedup_counts(spark, sf_dir):
    rows = dedup.dedup_exact(spark, sf_dir).collect()
    n_docs = sum(r.n_copies for r in rows)
    assert n_docs == 500
    assert all(r.n_copies >= 1 for r in rows)


def test_quality_score_bounds(spark, sf_dir):
    rows = text_analysis.text_quality(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.stop_ratio <= 1.0


def test_label_propagation_long_chain_converges(spark):
    """A 200-node chain (diameter 199) — plain min-label propagation
    would need 199 rounds and trip the cap; pointer-doubling must
    converge inside the default 20 (VERDICT r4 ask #6, answered by
    execution, not prose)."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators.dedup import propagate_min_labels

    n = 200
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    fwd = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    rows = propagate_min_labels(nodes, edges).collect()
    assert len(rows) == n
    assert all(r.group_id == 0 for r in rows)


def test_label_propagation_nonconvergence_is_loud(spark):
    """Exhausting the round budget must raise, never return partial
    labels (ADVICE r02's silent-break hazard)."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators.dedup import propagate_min_labels

    n = 200
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    fwd = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    with pytest.raises(RuntimeError, match="did not converge"):
        propagate_min_labels(nodes, edges, max_rounds=2)


def test_kmv_candidate_filter_never_truncates(spark, sf_dir):
    """The r5 per-group hash cap must keep at least min(K, exact)
    distinct hashes per group — k_used equality proves the capped
    top-K equals the uncapped top-K the oracle ranks."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.functions.hashing import MERSENNE_P, affine_params
    from robin_sparkles_spark.operators.sketches import SKETCH_K
    from robin_sparkles_spark.sources import load_table

    out = {r.event_type: r for r in sketches.users_kmv_by_type(spark, sf_dir).collect()}
    a, b = affine_params(0)
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        est = out[et].kmv_estimate
        if n < SKETCH_K:
            assert est == float(n)  # short-circuit branch: exact
        else:
            # truncation-free proof: the capped plan's estimate must
            # equal the estimate recomputed from the UNCAPPED k-th
            # smallest distinct hash (the ranking the oracle uses) —
            # est is a bijection of kth_min when exact ≥ K, so
            # equality here means the cap kept the true top-K
            h = (F.col("user_id") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)
            kth = (
                ev.where(F.col("event_type") == et)
                .select(h.alias("h"))
                .distinct()
                .orderBy("h")
                .limit(SKETCH_K)
                .agg(F.max("h").alias("kth"))
                .first()
                .kth
            )
            assert est == (SKETCH_K - 1) * float(MERSENNE_P) / kth, et


def test_hll_production_path_tolerance(spark, sf_dir):
    """The sketches module names HLL++ (`approx_count_distinct`) as
    the production cardinality path (one pass, bounded memory, no
    oracle because DuckDB's approx algorithm differs) — execute that
    claim: per-type estimates must sit within the documented rsd
    against exact distincts, engine-side, no Python."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.sources import load_table

    rsd = 0.05
    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd).alias("est"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # 5 standard deviations of the configured rsd — deterministic
        # given the data, loose enough to never flake
        assert abs(r.est - r.exact) <= max(2.0, 5 * rsd * r.exact), (
            r.event_type, r.exact, r.est,
        )


def test_semdedup_planted_recall(spark, sf_dir):
    """SemDeDup's cluster blocking must recover ≥90% of the planted
    near-dup pairs (measured: 0.98 at sf0.001, 1.0 at sf0.01, 0.94 at
    sf0.1 — the misses are pairs split across a cluster boundary, the
    documented blocking trade), every reported drop must point at a
    lower-id representative, and planted drops must name their true
    source."""
    from robin_sparkles_spark.operators.embedding_dedup import (
        NEARDUP_ID_OFFSET,
        NEARDUP_N,
    )

    rows = semdedup.semdedup_dropped(spark, sf_dir).collect()
    dropped = {r.vec_id: r for r in rows}
    planted = {i + NEARDUP_ID_OFFSET for i in range(NEARDUP_N)}
    recall = len(planted & set(dropped)) / NEARDUP_N
    assert recall >= 0.9, recall
    for r in rows:
        assert r.representative < r.vec_id
        assert r.n_dup_partners >= 1
        if r.vec_id in planted:
            assert r.representative == r.vec_id - NEARDUP_ID_OFFSET


def test_quality_sweep_is_monotone(spark, sf_dir):
    """Raising the cutoff can only shrink the surviving set: per
    source, docs_pass/tokens_pass/doc_survival are non-increasing in
    threshold, and the lowest rung is bounded by the source size."""
    rows = text_analysis.quality_threshold_sweep(spark, sf_dir).collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert by_source
    for source, ladder in by_source.items():
        ladder.sort(key=lambda r: r.threshold)
        assert len(ladder) == len(text_analysis.QUALITY_LADDER)
        for lo, hi in zip(ladder, ladder[1:]):
            assert hi.docs_pass <= lo.docs_pass
            assert hi.tokens_pass <= lo.tokens_pass
            assert hi.doc_survival <= lo.doc_survival


def test_bpe_apply_merge_is_greedy_on_adversarial_shapes(spark):
    """Pin ``_apply_merge``'s double-delimited replace to token-list
    greedy BPE on exactly the shapes where the r5 single-space
    fixpoint construction diverged (ADVICE r5): self-pair merges over
    runs of ≥5 identical symbols, shared-delimiter alternations, and
    chained merges whose later pairs involve earlier merge outputs.
    The corpus-level reference test below can't see these — the
    fixture corpus happens to lack the triggering words."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators import bpe

    def greedy(toks, l, r):
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    cases = [
        ("ooooo", [("o", "o")]),           # ADVICE reproduction
        ("aaaaa", [("a", "a")]),
        ("aaaa", [("a", "a")]),
        ("abab", [("a", "b")]),
        ("they", [("h", "e")]),            # cross-boundary guard
        ("banana", [("a", "n"), ("an", "a")]),
        ("oooooooo", [("o", "o"), ("oo", "oo")]),
        ("mississippi", [("s", "s"), ("i", "ss")]),
    ]
    rows = [(w,) for w, _ in cases]
    df = spark.createDataFrame(rows, "word string")
    chars = F.filter(F.split(F.col("word"), ""), lambda c: F.length(c) > 0)
    df = df.select("word", F.array_join(chars, bpe.SEQ_SEP).alias("seq"))
    # each case gets its own merge chain: apply per-word via a CASE of
    # per-case columns (tiny literal plan; this is a semantics test)
    for w, merges in cases:
        col = F.col("seq")
        for l, r in merges:
            col = bpe._apply_merge(col, l, r)
        df = df.withColumn(
            "seq", F.when(F.col("word") == w, col).otherwise(F.col("seq"))
        )
    got = {
        r.word: [t for t in r.seq.split(" ") if t]
        for r in df.collect()
    }
    for w, merges in cases:
        toks = list(w)
        for l, r in merges:
            toks = greedy(toks, l, r)
        assert got[w] == toks, (w, merges, got[w], toks)


def test_bpe_merges_match_python_reference(spark, sf_dir):
    """Third opinion beyond the SQL oracle: the distributed merges
    must equal a pure-Python BPE over the same word-frequency table —
    identical pair counting, the same (count DESC, left, right)
    tie-break, and leftmost non-overlapping merge application."""
    from collections import Counter

    from pyspark.sql import functions as F

    from robin_sparkles_spark.functions.text import ws_tokens
    from robin_sparkles_spark.operators import bpe
    from robin_sparkles_spark.sources import load_table

    freqs = {
        r.word: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select(F.explode(ws_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    def greedy_merge(toks, a, b):
        # TRUE token-list BPE merge (greedy left-to-right on symbol
        # lists) — deliberately NOT a string replace, so this pins
        # that the engine's anchored-fixpoint replace construction
        # equals real BPE, boundary cases included
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    seqs = {}
    for w, n in freqs.items():
        seqs[tuple(w)] = seqs.get(tuple(w), 0) + n
    expected = []
    for _ in range(bpe.BPE_ITERS):
        counts: Counter = Counter()
        for toks, n in seqs.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += n
        (s1, s2), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((s1, s2, cnt))
        merged: dict = {}
        for toks, n in seqs.items():
            key = tuple(greedy_merge(list(toks), s1, s2))
            merged[key] = merged.get(key, 0) + n
        seqs = merged
    got = [
        (r.lsym, r.rsym, r.pair_count)
        for r in bpe.bpe_merge_training(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected


def test_hll_matches_python_replica_and_accuracy(spark, sf_dir):
    """orders_custkey_hll: (a) the register path is pinned against a
    pure-Python replica of the exact same integer algebra (hash →
    bucket/remainder → rank → max-register → scaled harmonic sum), so
    a silent change in either dialect breaks here even if both
    dialects drift together; (b) the estimate at the mid-range fixture
    (n=1500, m=256 — inside the raw estimator's band) is within 3σ of
    the 1.04/√m error bound. The small-range regime (n ≪ 2.5m, raw
    estimator overshoots without the ln-based linear-counting
    correction the oracle-parity rules ban) is asserted OBSERVABLE:
    n_empty_registers > 0 flags it at the tiny fixture."""
    from robin_sparkles_spark.functions.hashing import MERSENNE_P, affine_params
    from robin_sparkles_spark.operators.sketches import (
        HLL_HASH_IDX,
        HLL_HASH_IDX2,
        HLL_M,
        HLL_REM_BITS,
        _HLL_C,
        _HLL_LC,
        _HLL_RAW_CUTOFF,
        orders_custkey_hll,
    )

    row = orders_custkey_hll(spark, "/root/testdata/sf0.01").collect()[0]

    # pure-Python replica over the same parquet column
    import pyarrow.parquet as pq

    custkeys = pq.read_table(
        "/root/testdata/sf0.01/orders.parquet", columns=["o_custkey"]
    )["o_custkey"].to_pylist()
    a, b = affine_params(HLL_HASH_IDX)
    a2, b2 = affine_params(HLL_HASH_IDX2)
    regs: dict[int, int] = {}
    for x in custkeys:
        h1 = (x * a + b) % MERSENNE_P
        h = ((h1 * h1) % MERSENNE_P * a2 + b2) % MERSENNE_P
        bucket, r = h >> HLL_REM_BITS, h & ((1 << HLL_REM_BITS) - 1)
        rank = HLL_REM_BITS + 1 - r.bit_length() if r else HLL_REM_BITS + 1
        regs[bucket] = max(regs.get(bucket, 0), rank)
    s = sum(
        1 << (HLL_REM_BITS + 1 - regs.get(j, 0)) for j in range(HLL_M)
    )
    assert row.harmonic_sum_scaled == s
    zeros = HLL_M - len(regs)
    assert row.n_empty_registers == zeros
    raw = _HLL_C / float(s)
    expect = (
        _HLL_LC[zeros - 1] if (raw <= _HLL_RAW_CUTOFF and zeros > 0) else raw
    )
    assert row.hll_estimate == expect

    # accuracy in the raw estimator's operating range (3σ of 1.04/√m)
    assert row.rel_error < 3 * 1.04 / (HLL_M ** 0.5), row

    # small-range regime: the table-driven linear-counting correction
    # applies (V > 0) and lands within a few percent of exact
    tiny = orders_custkey_hll(spark, "/root/testdata/sf0.001").collect()[0]
    assert tiny.n_empty_registers > 0
    assert tiny.rel_error < 0.10, tiny


def test_html_extract_strips_all_markup(spark, sf_dir):
    """The extracted sample must contain no residual markup, scripts,
    styles, or undecoded entities, and must contain decoded entity
    characters (the decode step is non-vacuous by construction)."""
    from robin_sparkles_spark.operators.web_text import html_extract_text

    rows = html_extract_text(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert "<" not in r.sample and ">" not in r.sample
        assert "script" not in r.sample and "color: red" not in r.sample
        assert "&amp;" not in r.sample and "&quot;" not in r.sample
        assert r.n_links == r.doc_id % 3 + 1
        assert r.n_words > 0 and r.extracted_len > 0


def test_url_normalize_drops_tracking_and_lowercases_host(spark, sf_dir):
    from robin_sparkles_spark.operators.web_text import url_normalize_stats

    rows = url_normalize_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.host == f"www.host-{r.doc_id % 50}.test"
        assert "utm_" not in r.normalized_url
        assert r.n_params_kept == 2  # a=, b= survive
        # params sorted → order-independent canonical key
        assert r.normalized_url.endswith(
            f"?a={r.doc_id % 3}&b={r.doc_id % 7}"
        )
        # path case preserved (only scheme/host are case-insensitive)
        assert "/Path/" in r.normalized_url


def test_url_blocklist_subtree_vs_exact_semantics(spark, sf_dir):
    """UT1 matching pins (r15): a registered-domain entry blocks its
    whole subtree (the www. host of every K % 10 == 3/7 domain), the
    exact-host entry blocks ONLY www.host-1.test, and every other host
    survives. Closed-form per source: source s holds doc_ids ≡ s
    (mod n_sources), hosts cycle doc_id % 50 — so the expected blocked
    count per source is computable exactly from the two moduli."""
    from robin_sparkles_spark.operators.web_text import (
        URL_BLOCKLIST,
        docs_url_blocklist_filter,
    )
    from robin_sparkles_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rows = {r.source: r for r in docs_url_blocklist_filter(spark, sf_dir).collect()}
    blocked_domains = {d for d, _ in URL_BLOCKLIST if not d.startswith("www.")}
    exact_hosts = {d for d, _ in URL_BLOCKLIST if d.startswith("www.")}
    expect: dict[str, list[int]] = {}
    for r in docs.collect():
        k = r.doc_id % 50
        hit = (
            f"host-{k}.test" in blocked_domains
            or f"www.host-{k}.test" in exact_hosts
        )
        expect.setdefault(r.source, []).append(int(hit))
    assert set(rows) == set(expect)
    for src, hits in expect.items():
        got = rows[src]
        assert got.n_docs == len(hits)
        assert got.n_blocked == sum(hits), src
        assert got.n_kept == len(hits) - sum(hits)
        assert (
            got.blocked_adult + got.blocked_gambling + got.blocked_tracker
            == got.n_blocked
        )


def test_url_blocklist_broadcasts_the_list(spark, sf_dir):
    """The blocklist side must appear as a BroadcastExchange in the
    physical plan — at UT1 scale (~4M rows) a shuffled join here would
    put a full exchange of the corpus on the match path."""
    from robin_sparkles_spark.operators.web_text import docs_url_blocklist_filter

    plan = (
        docs_url_blocklist_filter(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" in plan


def test_ccnet_buckets_terciles_and_reference_slice(spark, sf_dir):
    """Closed-form pins: buckets partition each language ~in thirds of
    the REFERENCE distribution; is_reference is exactly the
    doc_id % CCNET_REF_MOD slice; every lang present in the reference
    gets all three buckets when its score distribution has ≥ 3
    distinct values."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators import ngram_lm as N

    out = N.docs_ccnet_perplexity_buckets(spark, sf_dir).cache()
    assert out.where(
        (F.col("doc_id") % N.CCNET_REF_MOD == 0) != F.col("is_reference")
    ).count() == 0
    assert out.where(F.col("bucket") == "unbucketed").count() == 0
    # reference docs split ≤ ceil(n/3)+ties per bucket — check the
    # tercile property on the reference slice itself
    ref = out.where("is_reference")
    for r in ref.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum((F.col("bucket") == "tail").cast("long")).alias("t"),
    ).collect():
        # tail = scores strictly below the ceil(n/3)-th smallest →
        # at most ceil(n/3) - 1 of the reference docs (ties shrink it)
        assert r.t <= (r.n + 2) // 3, (r.lang, r.n, r.t)
    out.unpersist()


def test_ccnet_reference_thinning_composes(spark, sf_dir, monkeypatch):
    """The sampled-fit-law arm (reference > CCNET_REF_CAP → hash-thin
    to the cap) never executes at gate SFs; execute it here by
    shrinking the cap, and check the oracle callable follows the SAME
    dispatch — parity must hold through the thinned arm too."""
    from robin_sparkles_spark.operators import ngram_lm as N

    assert N._ccnet_thin_permille(N.CCNET_REF_CAP) == 1000
    assert N._ccnet_thin_permille(N.CCNET_REF_CAP * 4) == 250
    monkeypatch.setattr(N, "CCNET_REF_CAP", 50)
    N._CCNET_REF_N_CACHE.clear()
    try:
        df = N.docs_ccnet_perplexity_buckets(spark, sf_dir)
        assert_query_matches_oracle(
            df, N.docs_ccnet_buckets_oracle(sf_dir), sf_dir
        )
    finally:
        N._CCNET_REF_N_CACHE.clear()


def test_semantic_decontamination_split_and_flags(spark, sf_dir):
    """Semantic pins: the output universe is exactly the TRAIN side of
    the split (no eval vec ever appears), contaminated ⇔
    n_eval_matches > 0 ⇔ max_eval_cos ≥ τ, and clean rows carry the
    0/0.0 sentinels."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators.curation import EVAL_MOD, EVAL_REM
    from robin_sparkles_spark.operators.dedup import COSINE_SIMILAR_THRESHOLD
    from robin_sparkles_spark.operators.semdedup import decontaminate_semantic
    from robin_sparkles_spark.sources import load_table

    out = decontaminate_semantic(spark, sf_dir).cache()
    n_train = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id")
        .distinct()
        .where(F.col("vec_id") % EVAL_MOD != EVAL_REM)
        .count()
    )
    assert out.count() == n_train
    assert out.where(F.col("vec_id") % EVAL_MOD == EVAL_REM).count() == 0
    assert (
        out.where(
            F.col("contaminated") != (F.col("n_eval_matches") > 0)
        ).count()
        == 0
    )
    assert (
        out.where("contaminated").where(
            F.col("max_eval_cos") < COSINE_SIMILAR_THRESHOLD
        ).count()
        == 0
    )
    assert (
        out.where("NOT contaminated").where(
            (F.col("n_eval_matches") != 0) | (F.col("max_eval_cos") != 0.0)
        ).count()
        == 0
    )
    assert out.where("contaminated").count() > 0  # non-vacuous on fixture
    out.unpersist()


def test_curation_funnel_shape(spark, sf_dir):
    """Funnel invariants: stages in declared order, docs/tokens
    monotonically non-increasing, the first three filters each drop
    something on the fixture (blocklist ~22 % of hosts, the relaxed
    quality battery, the repetition battery — all non-vacuous by
    construction), and stage 0 equals the raw corpus exactly."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators.curation import (
        FUNNEL_STAGES,
        curation_funnel,
    )
    from robin_sparkles_spark.functions.text import ws_tokens
    from robin_sparkles_spark.sources import load_table

    rows = {
        r.stage: r
        for r in curation_funnel(spark, sf_dir).collect()
    }
    assert [rows[i].stage_name for i in sorted(rows)] == list(FUNNEL_STAGES)
    d = load_table(spark, sf_dir, "documents")
    n, toks = d.count(), d.select(
        F.sum(F.size(ws_tokens())).alias("t")
    ).first().t
    assert rows[0].docs_out == n and rows[0].tokens_out == toks
    for i in range(1, len(FUNNEL_STAGES)):
        assert rows[i].docs_out <= rows[i - 1].docs_out
        assert rows[i].tokens_out <= rows[i - 1].tokens_out
    for i in (1, 2, 3):  # the strict-drop stages on this fixture
        assert rows[i].docs_out < rows[i - 1].docs_out, FUNNEL_STAGES[i]


def test_maximal_spans_find_planted_passage(spark, tmp_path):
    """Lee-et-al semantics check on a planted corpus: two documents
    share one 12-token passage embedded among unique filler; the span
    report must contain exactly one span per sharing doc with the
    passage's exact start position and token length, and no spans in
    the all-unique doc."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq_

    passage = " ".join(f"shared{i}" for i in range(12))
    texts = [
        " ".join(f"a{i}" for i in range(5)) + " " + passage + " endA",
        passage + " " + " ".join(f"b{i}" for i in range(9)),
        " ".join(f"c{i}" for i in range(30)),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(3),
            "text": texts,
            "lang": ["en"] * 3,
            "source": ["gen"] * 3,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = str(tmp_path)
    pq_.write_table(pa.Table.from_pandas(pdf), f"{sf}/documents.parquet")

    rows = sorted(
        ngram_lm.ngram_maximal_spans(spark, sf).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.doc_id for r in rows] == [0, 1]
    assert (rows[0].start_pos, rows[0].span_tokens) == (5, 12)
    assert (rows[1].start_pos, rows[1].span_tokens) == (0, 12)
    # 12-token passage at K=8 chains 5 windows, each occurring twice
    for r in rows:
        assert r.n_windows == 12 - ngram_lm.SPAN_K + 1
        assert r.max_window_occ == 2


def test_dsir_importance_separates_target_from_raw(spark, sf_dir):
    """The importance direction: documents from the TARGET slice must
    score higher on average than raw-pool documents (they ARE the
    distribution the weights measure likelihood against), and the
    integer log2 must track math.log2 within its quantization bound."""
    import math

    from robin_sparkles_spark.operators import curation as cu
    from robin_sparkles_spark.operators.ngram_lm import TRAIN_SOURCES

    rows = cu.dsir_importance_weights(spark, sf_dir).collect()
    tgt = [r.importance_fp / max(r.n_features, 1) for r in rows if r.source in TRAIN_SOURCES]
    raw = [r.importance_fp / max(r.n_features, 1) for r in rows if r.source not in TRAIN_SOURCES]
    assert tgt and raw
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)

    # exact-integer log2 vs libm, across magnitudes: the comparison
    # ladder gives the exact exponent; the 64-entry mantissa LUT
    # bounds the error by one LUT step (log2(1 + 1/64) ≈ 0.0224)
    for q in (1, 2, 3, 63, 64, 65, 1 << 20, (1 << 20) + 12345, (1 << 43) - 1):
        e = q.bit_length() - 1
        m = (q >> (e - 6)) - 64 if e >= 6 else (q << (6 - e)) - 64
        got = e * cu.DSIR_LOG_SCALE + cu._DSIR_LOG2_LUT[m]
        want = math.log2(q) * cu.DSIR_LOG_SCALE
        assert abs(got - want) <= 0.0224 * cu.DSIR_LOG_SCALE + 1, (q, got, want)


def test_waterfill_exactness_properties(spark, sf_dir):
    """source_waterfill_allocation is an exact integer solver: the
    allocations sum to the budget EXACTLY, no source exceeds its own
    tokens, uncapped sources keep everything, and capped sources sit
    within one token of a common water level that is at least every
    uncapped source's size (the defining water-filling shape)."""
    from robin_sparkles_spark.operators.llm_prep import (
        WATERFILL_BUDGET_PCT,
        source_waterfill_allocation,
    )

    rows = source_waterfill_allocation(spark, sf_dir).collect()
    assert rows
    total = sum(r.tokens for r in rows)
    budget = total * WATERFILL_BUDGET_PCT // 100
    assert sum(r.alloc_tokens for r in rows) == budget
    for r in rows:
        assert 0 <= r.alloc_tokens <= r.tokens
        if not r.capped:
            assert r.alloc_tokens == r.tokens
    capped = [r.alloc_tokens for r in rows if r.capped]
    uncapped = [r.tokens for r in rows if not r.capped]
    assert capped, "a 60% budget must cap something on this fixture"
    assert max(capped) - min(capped) <= 1  # one common water level
    if uncapped:
        assert min(capped) >= max(uncapped)


def _epoch_global_rank(pdf):
    """Global training-order rank per doc_id: the loader reads shards
    in index order, so order key = (shard_id, pos_in_shard)."""
    ordered = pdf.sort_values(["shard_id", "pos_in_shard"]).reset_index(
        drop=True
    )
    return {int(d): i for i, d in enumerate(ordered.doc_id)}


def test_epoch_shuffle_is_a_permutation_and_seed_sensitive(spark, sf_dir):
    """docs_epoch_shuffle: (a) output is a permutation — every doc
    exactly once, positions within each shard are 1..|shard| dense;
    (b) deterministic across runs; (c) shards are roughly uniform;
    (d) a different seed yields a different order (the whole point)."""
    from robin_sparkles_spark.operators import llm_prep as L

    out = L.docs_epoch_shuffle(spark, sf_dir).toPandas()
    n = len(out)
    assert out.doc_id.is_unique
    for _, grp in out.groupby("shard_id"):
        assert sorted(grp.pos_in_shard) == list(range(1, len(grp) + 1))
    sizes = out.groupby("shard_id").size()
    assert len(sizes) == L._epoch_shuffle_shards(n)
    assert sizes.max() <= 2 * sizes.min() + 8  # uniform-ish partition
    again = L.docs_epoch_shuffle(spark, sf_dir).toPandas()
    key = lambda pdf: sorted(map(tuple, pdf.values.tolist()))
    assert key(out) == key(again)
    # seed sensitivity: monkeypatch the seed, expect a different order
    orig = L.EPOCH_SHUFFLE_SEED
    try:
        L.EPOCH_SHUFFLE_SEED = orig + 1
        other = L.docs_epoch_shuffle(spark, sf_dir).toPandas()
    finally:
        L.EPOCH_SHUFFLE_SEED = orig
    assert key(out) != key(other)


def test_epoch_shuffle_seeds_are_not_rotations(spark, sf_dir):
    """VERDICT r11 #1: the r11 seed entered the key only additively, so
    every epoch was a ROTATION of one fixed cyclic order — cross-seed
    pair-order flip rate ≈1/3 (cut probability), and no document triple
    ever changed cyclic order. A real permutation family resamples pair
    order at ≈1/2 per seed pair. This test detects the rotation defect
    the old `order(s) != order(s+1)` assert could not:

    (a) for each of 3 seed pairs, the fraction of doc PAIRS whose
        relative global order flips lies in a binomial-generous band
        around 1/2 (a rotation concentrates near gap/p, mean 1/3);
    (b) some doc TRIPLE changes cyclic order between seeds (invariant
        under every rotation, so impossible for the r11 form)."""
    from itertools import combinations

    from robin_sparkles_spark.operators import llm_prep as L

    orig = L.EPOCH_SHUFFLE_SEED
    ranks = {}
    try:
        for s in (orig, orig + 1, orig + 2, orig + 3):
            L.EPOCH_SHUFFLE_SEED = s
            ranks[s] = _epoch_global_rank(
                L.docs_epoch_shuffle(spark, sf_dir).toPandas()
            )
    finally:
        L.EPOCH_SHUFFLE_SEED = orig
    docs = sorted(ranks[orig])
    # sample a deterministic subset of pairs to keep the test O(10^4)
    sample = docs[:: max(1, len(docs) // 150)]
    pairs = list(combinations(sample, 2))
    assert len(pairs) >= 1000
    for s1, s2 in [(orig, orig + 1), (orig + 1, orig + 2), (orig + 2, orig + 3)]:
        r1, r2 = ranks[s1], ranks[s2]
        flips = sum(
            ((r1[a] < r1[b]) != (r2[a] < r2[b])) for a, b in pairs
        )
        rate = flips / len(pairs)
        # pairs are not independent, so the band is generous; it still
        # excludes the rotation family's 1/3 mean decisively
        assert 0.42 <= rate <= 0.58, (s1, s2, rate)

    def cyclic_class(triple, r):
        order = tuple(sorted(triple, key=lambda d: r[d]))
        # rotations of `order` are the same cyclic class
        rots = {order, order[1:] + order[:1], order[2:] + order[:2]}
        return min(rots)

    changed = any(
        cyclic_class(t, ranks[orig]) != cyclic_class(t, ranks[orig + 1])
        for t in combinations(sample[:12], 3)
    )
    assert changed, "no triple changed cyclic order — seeds only rotate"
