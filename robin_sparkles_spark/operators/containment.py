"""Shingle-CONTAINMENT dedup (r13, EXT): find documents EMBEDDED
inside other documents — the quote/boilerplate-inclusion case that
symmetric Jaccard misses by design.

Why a training-data pipeline needs this as a first-class operator:
a short document pasted into a longer one (a quoted article inside a
forum thread, an eval benchmark item inside a crawled page, licensed
boilerplate wrapping real content) has near-total CONTAINMENT
C(A→B) = |A∩B| / |A| while its Jaccard |A∩B| / |A∪B| is diluted by
the host document's extra content below any usable threshold — the
planted fixture pairs here sit at C = 1.0 with J ≈ 0.1–0.55, invisible
to ``dedup_ngram_jaccard`` at τ = 0.8. Asymmetric containment is the
standard detection primitive for both curation (drop the contained
copy, keep the host or vice versa) and decontamination sweeps.

Corpus: the organic fixture has no embedded-document structure (max
cross-doc containment == the 25 near-dup pairs Jaccard already
finds), so — the ``embedding_dedup`` planted-corpus pattern — this
module stages a derived corpus once per sf_dir: every document, plus,
for the first CONTAIN_N doc_ids, an "outer" document at
``doc_id + CONTAIN_ID_OFFSET`` whose text is
``filler-prefix ⊕ original text ⊕ filler-suffix``. Fillers are
FILLER_WORDS deterministic per-(doc, position) tokens, so each
planted inner's 3-gram set survives verbatim inside its outer
(containment exactly 1.0) while ~2·FILLER_WORDS new shingles dilute
Jaccard under 0.56 even for the largest fixture docs — the planted
pairs separate the two measures with margin. Staging uses the
source-fingerprint path (sources.staging), so regenerated testdata
invalidates stale corpora.

Semantics (both engines, hash-gated): over df-capped 3-gram shingle
sets (the ``dedup`` module's exact word-hash/shingle/cap pipeline),
emit every pair with C = shared / min(|A|, |B|) ≥ CONTAIN_THRESHOLD,
labeled (inner_doc, outer_doc, containment) where inner is the
smaller capped set (ties → the smaller doc_id, which is also the
join's doc1).

Plan shape (100 TB posture): two plans, one semantics, dispatched on
corpus size — the NGRAM_PREFIX_MIN_DOCS discipline:

- ≤ CONTAIN_PREFIX_MIN_DOCS: one inverted-index self-equi-join on the
  shingle hash — identical to ``dedup_ngram_jaccard``'s full-index
  form, join volume Σ_h df(h)² bounded by the df-cap (a hot shingle
  contributes ≤ cap² pairs at any corpus size).
- above: the ASYMMETRIC prefix filter (Bayardo/Chaudhuri adapted to
  containment): C(A→B) ≥ τ needs |A∩B| ≥ ⌈τ|A|⌉, so the smallest
  shared element must land in A's L_A = |A| − ⌈τ|A|⌉ + 1 rarest
  shingles — at τ = 0.9 the INNER probe side shrinks to ~|A|/10
  rows, while the outer side stays fully indexed (any of B's
  elements can match an inner prefix). Join volume drops from
  Σ df(h)² to Σ df_prefix(h)·df(h); candidates verify EXACTLY via
  sorted capped-set arrays — identical values to the full-index
  form (parity pytest forces both plans on the fixture).

Both corpus × corpus joins are SHUFFLE_HASH-pinned (the r10
corpus-broadcast audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources import load_table
from ..sources.staging import is_staged, staged_path
from .dedup import (
    NGRAM_DF_CAP,
    _SHINGLE_SQL,
    _WORD_HASH_EXPR,
    _WORD_HASHES_SQL,
    _SHINGLES_FROM_WH,
)

CONTAIN_N = 50
CONTAIN_ID_OFFSET = 1_000_000_000
CONTAIN_THRESHOLD = 0.9
FILLER_WORDS = 40  # per side; ~2·FILLER_WORDS new shingles per outer


def containment_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "containment_docs", "documents")


def build_containment_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently stage documents ⊕ planted outer documents. All
    derivation is JVM-side and deterministic (filler token k of doc i
    is the literal string ``cfx{i}x{k}`` / ``csx{i}x{k}`` — unique per
    (doc, side, k), so filler shingles have df 1 and never collide
    across outers)."""
    path = containment_corpus_path(sf_dir)
    if is_staged(path):
        return path
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # one action for both staging stats (the embedding_dedup pattern)
    max_id, n_docs = docs.agg(F.max("doc_id"), F.count("*")).first()
    if max_id is not None and max_id >= CONTAIN_ID_OFFSET:
        raise ValueError(
            f"documents.doc_id max {max_id} >= CONTAIN_ID_OFFSET "
            f"{CONTAIN_ID_OFFSET}: planted outer-doc ids would collide; "
            "raise the offset before staging this corpus"
        )

    def filler(tag: str) -> F.Column:
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(FILLER_WORDS - 1)),
                lambda k: F.concat(
                    F.lit(tag),
                    F.col("doc_id").cast("string"),
                    F.lit("x"),
                    k.cast("string"),
                ),
            ),
            " ",
        )

    outers = docs.where(F.col("doc_id") < CONTAIN_N).select(
        (F.col("doc_id") + CONTAIN_ID_OFFSET).alias("doc_id"),
        F.concat_ws(" ", filler("cfx"), F.col("text"), filler("csx")).alias(
            "text"
        ),
    )
    # file count grows with the corpus (≈8k docs/file, capped) — a
    # few-file staging at probe scale would be UNSPLITTABLE and
    # single-task every downstream scan (the r12 coalesce(1) lesson)
    n_files = max(4, min(64, ((n_docs or 0) + CONTAIN_N) // 8192))
    docs.unionByName(outers).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(path)
    return path


# Past this many documents the asymmetric prefix plan takes over
# (the NGRAM_PREFIX_MIN_DOCS discipline — below it the direct
# full-index join is cheaper; every gate SF stays on it, so gated
# plans never change when this constant moves).
CONTAIN_PREFIX_MIN_DOCS = 20_000

_DOC_COUNTS: dict[tuple, int] = {}


def _corpus_doc_count(spark: SparkSession, sf_dir: str) -> int:
    # fingerprint-keyed like dedup._ngram_doc_count (ADVICE r12)
    from ..sources.staging import source_fingerprint

    key = (
        spark.sparkContext.applicationId,
        source_fingerprint(sf_dir, "documents"),
    )
    if key not in _DOC_COUNTS:
        _DOC_COUNTS[key] = spark.read.parquet(
            build_containment_corpus(spark, sf_dir)
        ).count()
    return _DOC_COUNTS[key]


def _capped_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df-capped (doc_id, h, df) rows over the staged corpus. df is a
    groupBy(h) partial aggregation joined back — not an h-keyed window
    (VERDICT r13 #1: a window co-locates every occurrence of a hot
    shingle in one un-splittable task; the join-back is AQE-skew-
    splittable and its exchange is the same h-partitioning the
    candidate join needs — see dedup._df_capped_shingle_rows)."""
    corpus = spark.read.parquet(build_containment_corpus(spark, sf_dir))
    sh = (
        corpus.select("doc_id", F.expr(_WORD_HASH_EXPR).alias("wh"))
        .select("doc_id", F.explode(F.expr(_SHINGLES_FROM_WH)).alias("h"))
        .where(F.col("h").isNotNull())
    )
    dfs = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= NGRAM_DF_CAP)
    )
    return sh.join(dfs.hint("shuffle_hash"), "h")


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with shingle containment ≥ 0.9 over the planted corpus:
    (inner_doc, outer_doc, containment) — dispatched on corpus size
    (see module docstring). The integer pre-filter
    ``10·shared ≥ 9·min(sz)`` is exact for τ = 0.9, so the double
    division happens only on emitted rows (and is the same
    shared/min(sz) expression in both engines — bit-identical)."""
    if _corpus_doc_count(spark, sf_dir) <= CONTAIN_PREFIX_MIN_DOCS:
        return _containment_full_index(spark, sf_dir)
    return _containment_prefix(spark, sf_dir)


def _containment_full_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The direct inverted-index plan (cheapest at gate scales)."""
    # r16 REVERT of the r15 capped-index barrier (VERDICT r15 #1):
    # cold-protocol A/B (fresh process, count(), 5 interleaved reps,
    # 1 MB AQE floor) read barrier 2.04 vs no-barrier 1.55 s med —
    # the serial localCheckpoint job loses to replaying the branches
    # in parallel slack; see dedup._ngram_jaccard_full_index.
    capped = _capped_rows(spark, sf_dir).drop("df")
    # (a size-table barrier was tried and REVERTED here too — see the
    # measured negative at dedup._ngram_jaccard_full_index: the
    # duplicate count pass hides in parallel slack while the
    # checkpoint serializes a job.)
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = capped.alias("a").hint("shuffle_hash")
    b = capped.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .agg(F.count("*").alias("shared"))
    )
    s1 = sizes.alias("s1").hint("shuffle_hash")
    s2 = sizes.alias("s2").hint("shuffle_hash")
    inner_sz = F.least(F.col("s1.sz"), F.col("s2.sz"))
    # inner = the strictly smaller set, ties -> doc1 (the smaller id)
    inner = F.when(F.col("s2.sz") < F.col("s1.sz"), F.col("doc2")).otherwise(
        F.col("doc1")
    )
    outer = F.when(F.col("s2.sz") < F.col("s1.sz"), F.col("doc1")).otherwise(
        F.col("doc2")
    )
    return (
        shared.join(s1, F.col("doc1") == F.col("s1.doc_id"))
        .join(s2, F.col("doc2") == F.col("s2.doc_id"))
        .where(10 * F.col("shared") >= 9 * inner_sz)
        .select(
            inner.alias("inner_doc"),
            outer.alias("outer_doc"),
            (F.col("shared").cast("double") / inner_sz).alias("containment"),
        )
        .where(F.col("containment") >= CONTAIN_THRESHOLD)
    )


def _prefix_candidates(
    spark: SparkSession, sf_dir: str, capped: DataFrame | None = None
) -> DataFrame:
    """Candidate (inner_doc, outer_doc) pairs of the asymmetric
    prefix plan — factored out so probes can count candidates
    directly (the r13/r14 stage-profiling discipline).

    q-PREFIX scheme (r14 — the lever the r13 note named for the 100×
    verify join's 6.9M candidates): the inner side indexes its
    L_A + 1 rarest shingles (one more than the minimal prefix) and a
    candidate must share ≥ 2 of them with the outer's full index
    whenever ⌈τ|A|⌉ ≥ 2 (i.e. |A| ≥ 2 at τ = 0.9). Lossless: a
    qualifying pair shares s ≥ ⌈τ|A|⌉ elements, so A has ≤
    |A| − ⌈τ|A|⌉ = L_A − 1 non-shared elements, and among A's rarest
    L_A + 1 at most L_A − 1 are non-shared ⇒ ≥ 2 shared, each of
    which hits B's full index (per-doc shingles are DISTINCT, so
    hits = distinct shared prefix elements). |A| = 1 keeps the 1-hit
    rule. The pair groupBy replaces the former DISTINCT at the same
    shuffle cost (the ngram struct-min precedent), so the scheme's
    only added cost is one prefix row per inner doc."""
    if capped is None:
        capped = _capped_rows(spark, sf_dir)
    wd = W.partitionBy("doc_id")
    ranked = capped.withColumn(
        "rn", F.row_number().over(wd.orderBy("df", "h"))
    ).withColumn("sz", F.count(F.lit(1)).over(wd))
    prefix = ranked.where(
        F.expr("rn <= sz - (9 * sz + 9) DIV 10 + 2")
    ).select("doc_id", "df", "h", "sz", "rn")
    full = ranked.select("doc_id", "df", "h", "sz", "rn")
    a = prefix.alias("a").hint("shuffle_hash")  # inner probe side
    b = full.alias("b")  # outer side: fully indexed
    # inner strictly smaller, ties -> smaller doc_id (the full-index
    # labeling rule, expressed at candidate time)
    joined = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (
            (F.col("a.sz") < F.col("b.sz"))
            | (
                (F.col("a.sz") == F.col("b.sz"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
            )
        ),
    )
    # NOTE (r13, measured): the PPJoin positional bound that cut the
    # ngram prefix plan's candidates 3.4× is a NO-OP here — 6.905M →
    # 6.733M at 500k docs. Reason: containment's bound needs the
    # minimal shared element near the front of BOTH rarest-first
    # orders, and the inner's prefix holds its globally RAREST
    # shingles, which therefore also rank early in the outer's (df, h)
    # order — the j-side constraint almost never bites. The q-prefix
    # hit-count bound in the groupBy below is the lever that DOES bite
    # (6.905M → 83,163 measured; SCALE.md r14).
    return (
        joined.groupBy(
            F.col("a.doc_id").alias("inner_doc"),
            F.col("b.doc_id").alias("outer_doc"),
            F.col("a.sz").alias("sz_a"),
        )
        .agg(F.count(F.lit(1)).alias("hits"))
        .where(
            F.col("hits")
            >= F.when(F.col("sz_a") >= 2, F.lit(2)).otherwise(F.lit(1))
        )
        .select("inner_doc", "outer_doc")
    )


def _containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC prefix plan (see module docstring): the inner probe
    side indexes only its rarest shingles (global (df, h) order —
    ⌈9·sz/10⌉ = (9·sz+9) DIV 10, integer-exact, q-prefix form — see
    ``_prefix_candidates``); the outer side stays fully indexed.
    Candidates then verify EXACTLY via sorted capped-set arrays — the
    same shared/min(sz) arithmetic as the full-index form (fixture
    parity pinned in tests)."""
    # r16 REVERT of the r15 capped-index barrier — same cold-protocol
    # verdict as the full-index arm (see there).
    capped = _capped_rows(spark, sf_dir)
    docs = capped.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("h")).alias("hs"),
        F.count("*").alias("sz"),
    )
    cands = _prefix_candidates(spark, sf_dir, capped=capped)
    d1 = docs.alias("d1").hint("shuffle_hash")
    d2 = docs.alias("d2").hint("shuffle_hash")
    shared = F.size(F.array_intersect(F.col("d1.hs"), F.col("d2.hs")))
    return (
        cands.join(d1, F.col("inner_doc") == F.col("d1.doc_id"))
        .join(d2, F.col("outer_doc") == F.col("d2.doc_id"))
        .where(10 * shared >= 9 * F.col("d1.sz"))
        .select(
            "inner_doc",
            "outer_doc",
            (shared.cast("double") / F.col("d1.sz")).alias("containment"),
        )
        .where(F.col("containment") >= CONTAIN_THRESHOLD)
    )


def dedup_containment_oracle(sf_dir: str) -> str:
    """Lazy DuckDB twin over the SAME staged parquet: identical
    word-hash/shingle/df-cap pipeline, identical shared-count join,
    identical inner/outer labeling and double division."""
    from ..session import active_or_local

    spark = active_or_local("containment_oracle")
    path = build_containment_corpus(spark, sf_dir)
    return f"""
WITH raw AS (SELECT doc_id, text FROM read_parquet('{path}/*.parquet')),
docs AS (
  SELECT doc_id, {_SHINGLE_SQL} AS sh
  FROM (SELECT doc_id, {_WORD_HASHES_SQL} AS wh FROM raw)
  WHERE len(wh) >= 3
),
sh AS (SELECT doc_id, unnest(sh) AS h FROM docs),
capped AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS df FROM sh)
  WHERE df <= {NGRAM_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM capped GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS shared
  FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT CASE WHEN s2.sz < s1.sz THEN doc2 ELSE doc1 END AS inner_doc,
       CASE WHEN s2.sz < s1.sz THEN doc1 ELSE doc2 END AS outer_doc,
       CAST(shared AS DOUBLE) / LEAST(s1.sz, s2.sz) AS containment
FROM shared
JOIN sizes s1 ON doc1 = s1.doc_id
JOIN sizes s2 ON doc2 = s2.doc_id
WHERE 10 * shared >= 9 * LEAST(s1.sz, s2.sz)
  AND CAST(shared AS DOUBLE) / LEAST(s1.sz, s2.sz) >= {CONTAIN_THRESHOLD}
"""


QUERIES = {
    "dedup_containment": (dedup_containment, dedup_containment_oracle),
}
