"""Training-data curation operators (EXT — BASELINE.json north star):
the two composite shapes a 100 TB ingest pipeline actually runs.

- ``dedup_incremental``: dedup a NEW batch of documents against an
  already-indexed corpus — the daily-ingest shape. No corpus×corpus
  work: new-batch band rows equi-join the corpus band index, only
  new-vs-corpus candidates pay the exact-Jaccard verify. At 100 TB the
  corpus band index is a bucketed table maintained across runs and the
  per-batch cost is linear in the batch, not the corpus.
- ``curation_pipeline``: the keep-set composition — dedup-group
  canonical docs ∩ quality threshold, with the stable content-hash
  sample bucket attached. One declared query proving the operators
  compose without a driver-side loop.

Registry note: this module enumerates LAST (registry.py) — the driver
gate records the first 50 registry entries only, so post-cap additions
land here, where the parametrized local oracle sweep
(tests/test_llm_ops.py) is their hard signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.barrier import barrier
from ..functions.hashing import poly_fingerprint, poly_fingerprint_sql
from ..sources import load_table
from ..functions.pairs import pair_payload_fetch
from .dedup import (
    JACCARD_THRESHOLD,
    _DOCS_SHINGLES_SQL,
    _JACCARD_FETCHED,
    _JACCARD_SQL,
    _docs_with_shingles,
    _shingle_rows,
    banded_minhash,
    dedup_groups,
    minhash_bands_ctes,
    minhash_signatures,
)
from .text_analysis import text_quality, TEXT_QUALITY_SQL

# The "new batch" slice of the fixture corpus: every 5th doc (20%).
# Spreads uniformly over doc_id, so planted near-dup pairs straddle
# the batch/corpus boundary at every SF (verified non-vacuous at
# sf0.001/0.01/0.1). In production this predicate is "today's
# partition"; here it must be a pure doc_id expression so the DuckDB
# oracle can replicate the split exactly.

# Keep-set quality floor for the pipeline query. The fixture corpus
# scores cluster in ~0.15-0.46 (median ~0.40: stopword-ratio and
# word-length terms dominate; few docs get the 0.2 length bonus), so
# 0.38 keeps the filter selective (~40% dropped) but non-vacuous at
# every SF.
QUALITY_FLOOR = 0.38


def _is_new() -> F.Column:
    return F.col("doc_id") % 5 == 4


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup status of every NEW-batch document vs the corpus:
    (doc_id, dup_of, jaccard, is_dup). dup_of is the best corpus match
    (max Jaccard, ties → min corpus doc_id) or −1 when the document is
    genuinely new; jaccard is 0.0 for non-dups (sentinels, not NULLs —
    NULL floats round-trip differently through the two engines'
    dataframes).

    Plan shape: signatures for all docs (one shuffle), band index
    split new/corpus, new-vs-corpus equi-join on (band_idx, band_key),
    exact-Jaccard verify on candidates only, per-new-doc argmax via
    window, left join back to the full batch. Linear in batch +
    candidates — the corpus is only touched through its band index.

    Reference capability anchor: the tuner's cross-RUN memory
    (`ComputePartitions.scala:100-138` reads prior runs' metrics to
    decide the next run) applied to the data plane: prior ingests'
    index decides what's new today."""
    banded = banded_minhash(minhash_signatures(spark, sf_dir))
    # Data-sized × corpus-sized joins (batch band index vs corpus band
    # index, then verify joins against the per-doc shingle-set table):
    # pin SHUFFLE_HASH — the post-explode size estimates would
    # broadcast a corpus-sized side (r10 audit, see
    # dedup.dedup_ngram_jaccard).
    newb = banded.where(_is_new()).alias("n").hint("shuffle_hash")
    corp = banded.where(~_is_new()).alias("c")
    cands = (
        newb.join(
            corp,
            (F.col("n.band_idx") == F.col("c.band_idx"))
            & (F.col("n.band_key") == F.col("c.band_key")),
        )
        .select(F.col("n.doc_id").alias("new_id"), F.col("c.doc_id").alias("corpus_id"))
        .distinct()
    )
    docs = _docs_with_shingles(spark, sf_dir)
    # one-shuffle verify fetch (functions.pairs): new/corpus ids are
    # disjoint sets, so the c1 != c2 contract holds per pair
    verified = (
        pair_payload_fetch(
            cands, docs, "doc_id", "sh", "new_id", "corpus_id", "sh1", "sh2"
        )
        .select("new_id", "corpus_id", F.expr(_JACCARD_FETCHED).alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    w = W.partitionBy("new_id").orderBy(F.desc("jaccard"), F.asc("corpus_id"))
    best = (
        verified.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    batch = load_table(spark, sf_dir, "documents").where(_is_new()).select("doc_id")
    return batch.join(best, batch.doc_id == best.new_id, "left").select(
        "doc_id",
        F.coalesce(F.col("corpus_id"), F.lit(-1)).cast("long").alias("dup_of"),
        F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("jaccard"),
        F.col("corpus_id").isNotNull().alias("is_dup"),
    )


DEDUP_INCREMENTAL_SQL = f"""
WITH {minhash_bands_ctes()},
cands AS (
  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
  FROM bands n JOIN bands c
    ON n.band_idx = c.band_idx AND n.band_key = c.band_key
  WHERE n.doc_id % 5 = 4 AND NOT (c.doc_id % 5 = 4)
),
verified AS (
  SELECT new_id, corpus_id, {_JACCARD_SQL} AS jaccard
  FROM cands
  JOIN docs a ON new_id = a.doc_id
  JOIN docs b ON corpus_id = b.doc_id
  WHERE {_JACCARD_SQL} >= {JACCARD_THRESHOLD}
),
best AS (
  SELECT new_id, corpus_id, jaccard,
         ROW_NUMBER() OVER (PARTITION BY new_id ORDER BY jaccard DESC, corpus_id ASC) AS rn
  FROM verified
)
SELECT d.doc_id,
       CAST(COALESCE(b.corpus_id, -1) AS BIGINT) AS dup_of,
       COALESCE(b.jaccard, 0.0) AS jaccard,
       b.corpus_id IS NOT NULL AS is_dup
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.new_id
WHERE d.doc_id % 5 = 4
"""


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end keep-set: canonical docs from near-dup group
    resolution, above the quality floor, with the reproducible
    content-hash sample bucket attached — the row set a training run
    would actually read. Composition of three declared operators
    (dedup_groups ⋈ text_quality ⋈ documents) with zero driver-side
    logic beyond dedup_groups' own convergence loop."""
    groups = dedup_groups(spark, sf_dir)
    quality = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", (poly_fingerprint("text") % 100).alias("sample_bucket")
    )
    # corpus × corpus joins (one row per doc each side): pin
    # SHUFFLE_HASH against size misestimates (r10 audit).
    return (
        groups.where(F.col("is_canonical"))
        .join(quality.hint("shuffle_hash"), "doc_id")
        .where(F.col("quality_score") >= QUALITY_FLOOR)
        .join(d.hint("shuffle_hash"), "doc_id")
        .select("doc_id", "lang", "group_size", "quality_score", "sample_bucket")
    )


def _curation_pipeline_sql() -> str:
    from .dedup import DEDUP_GROUPS_SQL

    return f"""
WITH RECURSIVE groups AS ({DEDUP_GROUPS_SQL}),
quality AS ({TEXT_QUALITY_SQL})
SELECT g.doc_id, d.lang, g.group_size, q.quality_score,
       {poly_fingerprint_sql('d.text')} % 100 AS sample_bucket
FROM groups g
JOIN quality q USING (doc_id)
JOIN documents d USING (doc_id)
WHERE g.is_canonical AND q.quality_score >= {QUALITY_FLOOR}
"""


# Held-out eval slice for decontamination: ~5% of docs by id residue
# (pure doc_id expression so the oracle replicates the split exactly;
# in production this is the actual benchmark/eval corpus).
EVAL_MOD, EVAL_REM = 20, 7
CONTAM_MIN_SHARED = 2


def decontaminate_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination — the step every serious training-data
    pipeline runs before training: flag TRAIN documents sharing ≥
    ``CONTAM_MIN_SHARED`` distinct n-gram shingles with ANY held-out
    eval document. Returns one row per train doc:
    (doc_id, n_shared, contaminated).

    Plan shape: the eval side collapses to its DISTINCT shingle set
    (tiny — |eval| ≪ |train| always), the train shingle index
    equi-joins it on the shingle hash, and a per-doc count + left join
    back completes the flag — linear in the train index, zero
    train×train or eval×eval work. The same inverted-index discipline
    as ``dedup_ngram_jaccard``, pointed across two corpora. n=3 word
    shingles here (fixture docs are short); production decontamination
    raises n (8–13) — the plan is n-agnostic."""
    sh = _shingle_rows(spark, sf_dir)
    is_eval = (F.col("doc_id") % EVAL_MOD) == EVAL_REM
    eval_sh = sh.where(is_eval).select("h").distinct()
    shared = (
        sh.where(~is_eval)
        .join(eval_sh, "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    train_docs = (
        load_table(spark, sf_dir, "documents")
        .where((F.col("doc_id") % EVAL_MOD) != EVAL_REM)
        .select("doc_id")
    )
    # shared is train-corpus-sized: pin SHUFFLE_HASH (r10 audit). The
    # eval_sh join above stays broadcastable BY SEMANTICS (the eval
    # slice is a bounded benchmark corpus, |eval| ≪ |train|).
    return train_docs.join(shared.hint("shuffle_hash"), "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
        (F.coalesce(F.col("n_shared"), F.lit(0)) >= CONTAM_MIN_SHARED).alias(
            "contaminated"
        ),
    )


DECONTAMINATE_SQL = f"""
WITH docs AS ({_DOCS_SHINGLES_SQL}),
sh AS (SELECT doc_id, unnest(sh) AS h FROM docs),
eval_sh AS (SELECT DISTINCT h FROM sh WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
shared AS (
  SELECT s.doc_id, COUNT(*) AS n_shared
  FROM sh s JOIN eval_sh e ON s.h = e.h
  WHERE s.doc_id % {EVAL_MOD} != {EVAL_REM}
  GROUP BY s.doc_id
),
train AS (SELECT doc_id FROM documents WHERE doc_id % {EVAL_MOD} != {EVAL_REM})
SELECT t.doc_id,
       CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
       COALESCE(s.n_shared, 0) >= {CONTAM_MIN_SHARED} AS contaminated
FROM train t LEFT JOIN shared s ON t.doc_id = s.doc_id
"""


# --- cross-source overlap matrix (r9) ---------------------------------------


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise shingle overlap between sources — the corpus-level
    contamination/diversity diagnostic (which feeds duplicate mass
    into which: mirror sites, syndicated text, cross-dump overlap).
    For every source pair s1 < s2: each side's distinct-shingle
    count, the shared distinct count, Jaccard, and containment
    (shared / min side — the "one corpus swallows the other"
    signal).

    Plan shape (r15, guide §2.4): ONE shuffle on the shingle hash
    builds the per-shingle sorted source SET (bounded by #sources, a
    small domain); per-source sizes and the s1 < s2 pair counts are
    both generated from that set in-stage — the former distinct
    (source, shingle) exchange and the vocab × vocab self-join (two
    more exchanges + a join) are gone. Output is linear in the
    shingle vocabulary — never in the corpus. At 100 TB the only big
    shuffle is the groupBy on h, which the former distinct already
    paid."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src_sets = (
        _shingle_rows(spark, sf_dir)
        # corpus × corpus join (docs has one row per document): pin
        # SHUFFLE_HASH against size misestimates (r10 audit)
        .join(docs.hint("shuffle_hash"), "doc_id")
        .groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
    )
    # vocab-bound table consumed by two branches (sizes + pairs)
    src_sets = barrier(
        src_sets, "vocab", "per-shingle source sets", eager=False
    )
    sizes = (
        src_sets.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )
    # ascending-sorted set => (x at i) paired with every later y gives
    # exactly the source1 < source2 pairs the old self-join produced.
    shared = (
        src_sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), "
                    "y -> struct(x AS source1, y AS source2))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.source1").alias("source1"), F.col("p.source2").alias("source2"))
        .agg(F.count("*").alias("shared"))
    )
    n1 = sizes.select(
        F.col("source").alias("source1"), F.col("n").alias("n1")
    )
    n2 = sizes.select(
        F.col("source").alias("source2"), F.col("n").alias("n2")
    )
    return (
        shared.join(F.broadcast(n1), "source1")
        .join(F.broadcast(n2), "source2")
        .select(
            "source1",
            "source2",
            "n1",
            "n2",
            "shared",
            (
                F.col("shared").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("shared")).cast("double")
            ).alias("jaccard"),
            (
                F.col("shared").cast("double")
                / F.least("n1", "n2").cast("double")
            ).alias("containment"),
        )
    )


SOURCE_OVERLAP_SQL = f"""
WITH docs AS ({_DOCS_SHINGLES_SQL}),
src_sh AS (
  SELECT DISTINCT d.source, u.h
  FROM (SELECT doc_id, unnest(sh) AS h FROM docs) u
  JOIN documents d USING (doc_id)
),
sizes AS (SELECT source, COUNT(*) AS n FROM src_sh GROUP BY source),
shared AS (
  SELECT a.source AS source1, b.source AS source2, COUNT(*) AS shared
  FROM src_sh a JOIN src_sh b
    ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source1, source2,
       CAST(n1.n AS BIGINT) AS n1,
       CAST(n2.n AS BIGINT) AS n2,
       CAST(shared AS BIGINT) AS shared,
       CAST(shared AS DOUBLE) / CAST(n1.n + n2.n - shared AS DOUBLE)
         AS jaccard,
       CAST(shared AS DOUBLE) / CAST(LEAST(n1.n, n2.n) AS DOUBLE)
         AS containment
FROM shared
JOIN sizes n1 ON n1.source = shared.source1
JOIN sizes n2 ON n2.source = shared.source2
"""


# --- quality-weighted canonical selection (r9) ------------------------------


def dedup_canonical_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation ENDPOINT for multi-doc dup groups: instead of the
    min-id canonical `dedup_groups` labels, keep the HIGHEST-QUALITY
    member of each group (quality_score desc, doc_id asc tie-break) —
    the policy a real pipeline ships, because near-dup groups often
    mix a clean original with boilerplate-wrapped copies. One row per
    group of size ≥ 2: keeper, its score, and how many docs drop.

    Plan: the group labels come from the memoized connected-components
    result; quality is a map-only projection; the argmax is a window
    over group_id (bounded partitions — a dup group's size is
    corpus-independent). Nothing here re-touches the pair graph."""
    from .dedup import dedup_groups

    groups = dedup_groups(spark, sf_dir).where(F.col("group_size") >= 2)
    qual = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    w = W.partitionBy("group_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        # corpus × corpus join: pin SHUFFLE_HASH (r10 audit)
        groups.join(qual.hint("shuffle_hash"), "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "group_id",
            F.col("doc_id").alias("keeper_id"),
            "group_size",
            F.col("quality_score").alias("keeper_score"),
            (F.col("group_size") - 1).cast("long").alias("n_dropped"),
        )
    )


def _canonical_keepers_sql() -> str:
    from .dedup import DEDUP_GROUPS_SQL

    return f"""
WITH g AS MATERIALIZED ({DEDUP_GROUPS_SQL}),
q AS MATERIALIZED ({TEXT_QUALITY_SQL}),
ranked AS (
  SELECT g.group_id, g.doc_id, g.group_size, q.quality_score,
         ROW_NUMBER() OVER (PARTITION BY g.group_id
                            ORDER BY q.quality_score DESC, g.doc_id ASC)
           AS rk
  FROM g JOIN q USING (doc_id)
  WHERE g.group_size >= 2
)
SELECT group_id,
       doc_id AS keeper_id,
       group_size,
       quality_score AS keeper_score,
       CAST(group_size - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rk = 1
"""


# --- DSIR-style importance weights (r10) -------------------------------------
#
# Xie et al. 2023 ("Data Selection for Language Models via Importance
# Resampling"): select raw-pool documents whose hashed-n-gram feature
# distribution looks like a TARGET corpus — per-doc importance
# log p_target(doc)/p_raw(doc) = Σ_features log(p_t(b)/p_r(b)) over
# hashed feature buckets (bag-of-hashed-ngrams bigram model). Here
# the target proxy is the ``TRAIN_SOURCES`` slice (the same
# reference-corpus convention the n-gram LM family uses) and the raw
# pool is every other source.
#
# No-libm contract: the log is computed in EXACT integer arithmetic —
# bucket ratio q = ((tgt+1)·2^20) // (raw+1), exponent = Σ (q ≥ 2^k)
# comparisons (an exact floor(log2)), mantissa from a 64-entry
# log2(1 + i/64) lookup in 2^16 fixed point (literal table below;
# every entry ≥ 1.4e-3 from a rounding boundary, so the literals are
# platform-stable). Quantization ≤ ~0.012 log2 per feature — far
# inside data-selection tolerance — and both engines evaluate the
# identical integer expressions, so the gate hashes exactly.
#
# Scale: one feature-hash explode (map-only), ONE 4096-bucket
# aggregate (a domain-bound table — broadcastable by construction),
# a broadcast join back onto the feature stream, and a per-doc sum.
# Bucket counts at 100 TB stay < 2^43 per side, so the << 20 ratio
# stays inside int64. Linear end to end; the bucket table is the
# only state.

DSIR_BUCKETS = 4096
DSIR_RATIO_BITS = 20  # ratio fixed point (2^20)
DSIR_LOG_SCALE = 65536  # log2 fixed point (2^16)
_DSIR_LOG2_LUT = (
    0, 1466, 2909, 4331, 5732, 7112, 8473, 9814, 11136, 12440, 13727,
    14996, 16248, 17484, 18704, 19909, 21098, 22272, 23433, 24579,
    25711, 26830, 27936, 29029, 30109, 31178, 32234, 33279, 34312,
    35334, 36346, 37346, 38336, 39316, 40286, 41246, 42196, 43137,
    44068, 44990, 45904, 46809, 47705, 48593, 49472, 50344, 51207,
    52063, 52911, 53751, 54584, 55410, 56229, 57040, 57845, 58643,
    59434, 60219, 60997, 61769, 62534, 63294, 64047, 64794,
)
# ~45 comparisons cover any int64 ratio (tgt counts < 2^43 << 20)
_DSIR_MAX_EXP = 45


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance (fixed-point log2 of the hashed
    unigram+bigram likelihood ratio target/raw): (doc_id, source,
    n_features, importance_fp). Positive = looks like the target
    slice; the resampling step is ``ORDER BY importance_fp`` +
    Gumbel/top-k, both already-declared primitives."""
    from .dedup import MERSENNE_P  # noqa: F401  (hash family doc pointer)
    from .ngram_lm import TRAIN_SOURCES, _lc_tokens

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", _lc_tokens().alias("ws"))
    feats_expr = (
        "concat(ws, if(size(ws) >= 2,"
        " transform(sequence(0, size(ws) - 2),"
        "           i -> concat(ws[i], ' ', ws[i+1])),"
        " array()))"
    )
    bucket = (
        f"CAST(conv(substring(md5(f), 1, 15), 16, 10) AS BIGINT)"
        f" % {DSIR_BUCKETS}"
    )
    feats = toks.select(
        "doc_id", "source", F.explode(F.expr(feats_expr)).alias("f")
    ).withColumn("b", F.expr(bucket))
    is_tgt = F.col("source").isin(*TRAIN_SOURCES)
    buckets = feats.groupBy("b").agg(
        F.sum(is_tgt.cast("long")).alias("tgt_c"),
        F.sum((~is_tgt).cast("long")).alias("raw_c"),
    )
    exp_sql = " + ".join(
        f"(CASE WHEN q >= {1 << k} THEN 1 ELSE 0 END)"
        for k in range(1, _DSIR_MAX_EXP + 1)
    )
    lut_sql = "array(" + ", ".join(str(x) for x in _DSIR_LOG2_LUT) + ")"
    scored_buckets = (
        buckets.withColumn(
            "q",
            F.expr(
                f"greatest((( tgt_c + 1 ) * {1 << DSIR_RATIO_BITS})"
                f" div (raw_c + 1), CAST(1 AS BIGINT))"
            ),
        )
        .withColumn("e", F.expr(exp_sql))
        .withColumn(
            "lg_fp",
            F.expr(
                f"(e - {DSIR_RATIO_BITS}) * {DSIR_LOG_SCALE}"
                f" + element_at({lut_sql},"
                f" CAST((CASE WHEN e >= 6 THEN shiftright(q, e - 6) - 64"
                f" ELSE shiftleft(q, 6 - e) - 64 END) AS INT) + 1)"
            ),
        )
        .select("b", "lg_fp")
    )
    per_doc = (
        feats.join(F.broadcast(scored_buckets), "b")  # 4096-row domain
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_features"),
            F.sum("lg_fp").alias("importance_fp"),
        )
    )
    return (
        d.select("doc_id", "source")
        .join(per_doc.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            F.coalesce("importance_fp", F.lit(0)).alias("importance_fp"),
        )
    )


def _dsir_sql() -> str:
    from .ngram_lm import _LC_TOKS_SQL, _TRAIN_SQL

    exp_sql = " + ".join(
        f"(CASE WHEN q >= {1 << k} THEN 1 ELSE 0 END)"
        for k in range(1, _DSIR_MAX_EXP + 1)
    )
    lut_sql = "[" + ", ".join(str(x) for x in _DSIR_LOG2_LUT) + "]"
    return f"""
WITH toks AS (
  SELECT doc_id, source, {_LC_TOKS_SQL} AS ws FROM documents
),
feats AS MATERIALIZED (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(f), 1, 15)) AS BIGINT)
           % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, source,
               unnest(list_concat(ws,
                 CASE WHEN len(ws) >= 2
                      THEN list_transform(generate_series(1, len(ws) - 1),
                                          i -> concat(ws[i], ' ', ws[i+1]))
                      ELSE [] END)) AS f
        FROM toks)
),
buckets AS (
  SELECT b,
         SUM(CASE WHEN source IN ({_TRAIN_SQL}) THEN 1 ELSE 0 END) AS tgt_c,
         SUM(CASE WHEN source IN ({_TRAIN_SQL}) THEN 0 ELSE 1 END) AS raw_c
  FROM feats GROUP BY b
),
ratio AS (
  SELECT b, GREATEST(((tgt_c + 1) * {1 << DSIR_RATIO_BITS}) // (raw_c + 1),
                     1) AS q
  FROM buckets
),
expo AS (SELECT b, q, {exp_sql} AS e FROM ratio),
scored AS (
  SELECT b,
         (e - {DSIR_RATIO_BITS}) * {DSIR_LOG_SCALE}
         + {lut_sql}[CAST((CASE WHEN e >= 6 THEN (q >> (e - 6)) - 64
                                ELSE (q << (6 - e)) - 64 END) AS INT) + 1]
           AS lg_fp
  FROM expo
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_features, SUM(lg_fp) AS importance_fp
  FROM feats JOIN scored USING (b) GROUP BY doc_id
)
SELECT d.doc_id, d.source,
       CAST(COALESCE(n_features, 0) AS BIGINT) AS n_features,
       CAST(COALESCE(importance_fp, 0) AS BIGINT) AS importance_fp
FROM documents d LEFT JOIN per_doc USING (doc_id)
"""


DSIR_IMPORTANCE_SQL = _dsir_sql()


QUERIES = {
    "dedup_incremental": (dedup_incremental, DEDUP_INCREMENTAL_SQL),
    "dsir_importance_weights": (dsir_importance_weights, DSIR_IMPORTANCE_SQL),
    "curation_pipeline": (curation_pipeline, _curation_pipeline_sql()),
    "decontaminate_train": (decontaminate_train, DECONTAMINATE_SQL),
    "source_overlap_matrix": (source_overlap_matrix, SOURCE_OVERLAP_SQL),
    "dedup_canonical_keepers": (
        dedup_canonical_keepers,
        _canonical_keepers_sql(),
    ),
}


# --- streaming text-ingest batch twin (late r11) -----------------------------


def dedup_text_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming.text_ingest.text_ingest_stream`` —
    the IDENTICAL function over the batch scan of the staged arrivals
    and the persisted band/payload indexes (every operator in it is
    streaming-legal; the stream==batch parity pytest plus this oracle
    gate transitively check the readStream form).

    Same verdict semantics as :func:`dedup_incremental` — so the
    oracle is the same SQL — but the streaming-legal plan: projection
    MinHash (array_min over transform, no aggregate), left-outer
    band/payload joins carrying the arrival's shingle payload, and a
    grouped max(struct(jaccard, −corpus_id)) argmax instead of the
    row_number window."""
    from ..streaming.text_ingest import (
        stage_text_arrivals,
        stage_text_index,
        text_ingest_dedup_stream,
    )

    bands, payload = stage_text_index(spark, sf_dir)
    arrivals = spark.read.parquet(stage_text_arrivals(spark, sf_dir))
    return text_ingest_dedup_stream(
        arrivals, spark.read.parquet(bands), spark.read.parquet(payload)
    )


# --- FineWeb-style survival funnel (r15) -------------------------------------
#
# The table every curation report leads with: the ordered filter chain
# with cumulative doc/token survival per stage — FineWeb/RefinedWeb
# publish exactly this shape (URL filtering → quality → repetition →
# dedup, each with "docs remaining / tokens remaining"). Composes four
# DECLARED r14/r15 operators by their per-doc verdicts (each verdict
# is keyed by doc_id; the repetition verdict is computed on its staged
# re-chunked twin of the same documents — the doc_id key is the
# contract), so the funnel is pure composition with zero new filter
# logic to drift.
#
# Plan shape: four verdict frames (one map-only + blocklist broadcast
# join, two flag projections, one digest groupBy+join-back), joined on
# doc_id (co-partitioned equi-joins), ONE global aggregation of the
# five cumulative sums, and a 5-row literal unpivot. At 100 TB every
# stage partial-aggregates; nothing is corpus × corpus.

FUNNEL_STAGES = (
    "raw",
    "url_blocklist",
    "gopher_quality",
    "gopher_repetition",
    "exact_dedup",
    "near_dedup",
)


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage, stage_name, docs_out, tokens_out) — cumulative
    survivors after each filter, in FUNNEL_STAGES order.

    r15 optimization (guide §2.4): the v1 (URL blocklist) and v2
    (Gopher quality) verdicts are pure per-row functions of the same
    documents row the base projection already scans, so they ride the
    base scan as map-only expressions (``web_text.url_unblocked_expr``
    / ``text_analysis.gopher_quality_exprs`` — the same definitions
    the declared filter queries use) instead of two more documents
    scans reassembled through corpus×corpus doc_id shuffle joins.
    Measured at sf0.1 (noop, min of 4): 5 joins → 3, documents scans
    for verdicts 3 → 1, funnel output hash-identical."""
    from ..functions.text import ws_tokens
    from .gopher_repetition import docs_gopher_repetition_flags
    from .text_analysis import gopher_quality_exprs
    from .web_text import url_unblocked_expr

    # stopword_ok is excluded from the funnel's quality verdict: the
    # fixture vocabulary contains only "the" from the canonical stop
    # set, so the full Gopher conjunction keeps ZERO synthetic docs
    # (correct Gopher behavior — documented at
    # text_analysis.docs_gopher_quality_flags — but it would zero
    # stages 2-4 and leave the downstream verdict logic untested;
    # FineWeb likewise re-tunes the stop-word rule per corpus).
    _, _, qflags = gopher_quality_exprs()
    v2_expr = (
        qflags["wc_ok"]
        & qflags["mwl_ok"]
        & qflags["symbol_ok"]
        & qflags["bullet_ok"]
        & qflags["ellipsis_ok"]
        & qflags["alpha_ok"]
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(ws_tokens()).cast("long").alias("n_tokens"),
        F.sha2(F.col("text"), 256).alias("digest"),
        url_unblocked_expr().alias("v1"),
        v2_expr.alias("v2"),
    )
    v3 = docs_gopher_repetition_flags(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("v3")
    )
    canon = (
        d.groupBy("digest")
        .agg(F.min("doc_id").alias("canonical_doc_id"))
    )
    # stage 5: MinHash near-dup canonicals (the FineWeb dedup unit —
    # exact dups are absent from the fixture below sf0.1, so the
    # near-dup stage is the one that discriminates at every gate SF;
    # both are kept because production funnels report both)
    v5 = dedup_groups(spark, sf_dir).select(
        "doc_id", F.col("is_canonical").alias("v5")
    )
    j = (
        d.join(v3.hint("shuffle_hash"), "doc_id")
        .join(v5.hint("shuffle_hash"), "doc_id")
        .join(canon.hint("shuffle_hash"), "digest")
        .withColumn("v4", F.col("doc_id") == F.col("canonical_doc_id"))
    )
    conds = [
        F.lit(True),
        F.col("v1"),
        F.col("v1") & F.col("v2"),
        F.col("v1") & F.col("v2") & F.col("v3"),
        F.col("v1") & F.col("v2") & F.col("v3") & F.col("v4"),
        F.col("v1") & F.col("v2") & F.col("v3") & F.col("v4") & F.col("v5"),
    ]
    agg = j.agg(
        *[
            F.sum(F.when(c, 1).otherwise(0)).cast("long").alias(f"d{i}")
            for i, c in enumerate(conds)
        ],
        *[
            F.sum(F.when(c, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias(f"t{i}")
            for i, c in enumerate(conds)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage"),
                F.lit(name).alias("stage_name"),
                F.col(f"d{i}").alias("docs_out"),
                F.col(f"t{i}").alias("tokens_out"),
            )
            for i, name in enumerate(FUNNEL_STAGES)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.stage", "r.stage_name", "r.docs_out", "r.tokens_out"
    )


def curation_funnel_oracle(sf_dir: str) -> str:
    """Lazy twin (the repetition stage reads its staged corpus):
    identical verdict CTEs, identical cumulative sums, 5-row UNION."""
    from .gopher_repetition import docs_gopher_repetition_oracle
    from .text_analysis import _docs_gopher_quality_sql
    from .web_text import _BLOCKLIST_SQL, _URL_BLOCKED_PERDOC_SQL

    perdoc = _URL_BLOCKED_PERDOC_SQL.replace(
        "__BLOCKLIST_VALUES__", _BLOCKLIST_SQL
    )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS stage, '{name}' AS stage_name, "
        f"d{i} AS docs_out, t{i} AS tokens_out FROM agg"
        for i, name in enumerate(FUNNEL_STAGES)
    )
    conds = [
        "TRUE",
        "v1",
        "v1 AND v2",
        "v1 AND v2 AND v3",
        "v1 AND v2 AND v3 AND v4",
        "v1 AND v2 AND v3 AND v4 AND v5",
    ]
    sums = ", ".join(
        f"CAST(SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS d{i}, "
        f"CAST(SUM(CASE WHEN {c} THEN n_tokens ELSE 0 END) AS BIGINT) AS t{i}"
        for i, c in enumerate(conds)
    )
    from .dedup import DEDUP_GROUPS_SQL

    return f"""
WITH RECURSIVE {perdoc},
groups AS ({DEDUP_GROUPS_SQL}),
q AS (SELECT doc_id,
             (wc_ok AND mwl_ok AND symbol_ok AND bullet_ok
              AND ellipsis_ok AND alpha_ok) AS v2
      FROM ({_docs_gopher_quality_sql()})),
r AS (SELECT doc_id, keep AS v3 FROM ({docs_gopher_repetition_oracle(sf_dir)})),
base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0))
              AS BIGINT) AS n_tokens,
         sha256(text) AS digest
  FROM documents
),
canon AS (
  SELECT digest, MIN(doc_id) AS canonical_doc_id FROM base GROUP BY digest
),
j AS (
  SELECT b.doc_id, b.n_tokens,
         (p.category IS NULL) AS v1, q.v2 AS v2, r.v3 AS v3,
         (b.doc_id = c.canonical_doc_id) AS v4,
         g.is_canonical AS v5
  FROM base b
  JOIN per_doc p ON b.doc_id = p.doc_id
  JOIN q ON b.doc_id = q.doc_id
  JOIN r ON b.doc_id = r.doc_id
  JOIN canon c ON b.digest = c.digest
  JOIN groups g ON b.doc_id = g.doc_id
),
agg AS (SELECT {sums} FROM j)
{union}
"""


QUERIES_TAIL = {
    # Oracle shared with dedup_incremental: identical split,
    # threshold, tie-break and sentinels (the plans differ — this is
    # the streaming-legal aggregation shape).
    "dedup_text_stream_ingest": (
        dedup_text_stream_ingest,
        DEDUP_INCREMENTAL_SQL,
    ),
    "curation_funnel": (curation_funnel, curation_funnel_oracle),
}
