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

Plan shape (100 TB posture): one inverted-index self-equi-join on the
shingle hash — identical to ``dedup_ngram_jaccard``'s full-index form,
whose join volume Σ_h df(h)² is bounded by the df-cap (a hot shingle
contributes ≤ cap² pairs at any corpus size) and whose 10×/100× scale
behavior is measured in SCALE.md. SHUFFLE_HASH-pinned (the r10
corpus-broadcast audit). The containment analogue of prefix filtering
(index only the inner side's rarest |A| − ⌈0.9|A|⌉ + 1 shingles; the
outer side must stay fully indexed — Bayardo §3.2's asymmetric
variant) is the documented next step past ~10⁵ docs, the same
dispatch discipline as NGRAM_PREFIX_MIN_DOCS.
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
    max_id = docs.agg(F.max("doc_id")).first()[0]
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
    docs.unionByName(outers).repartition(4).write.mode("overwrite").parquet(
        path
    )
    return path


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with shingle containment ≥ 0.9 over the planted corpus:
    (inner_doc, outer_doc, containment). The integer pre-filter
    ``10·shared ≥ 9·min(sz)`` is exact for τ = 0.9, so the double
    division happens only on emitted rows (and is the same
    shared/min(sz) expression in both engines — bit-identical)."""
    corpus = spark.read.parquet(build_containment_corpus(spark, sf_dir))
    sh = (
        corpus.select("doc_id", F.expr(_WORD_HASH_EXPR).alias("wh"))
        .select("doc_id", F.explode(F.expr(_SHINGLES_FROM_WH)).alias("h"))
        .where(F.col("h").isNotNull())
    )
    # df-cap via the h-window: the exchange it needs is the join's
    # partitioning, so the cap costs no extra shuffle (see
    # dedup._df_capped_shingle_rows)
    capped = (
        sh.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("h")))
        .where(F.col("df") <= NGRAM_DF_CAP)
        .drop("df")
    )
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
