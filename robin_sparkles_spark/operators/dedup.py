"""Deduplication operators over the documents corpus (EXT —
BASELINE.json north star): exact, n-gram Jaccard, MinHash+LSH,
SimHash, and embedding-cosine near-dup.

All five are oracle-checked end-to-end — including MinHash and
SimHash, which normally defy cross-engine checking because they hash.
The trick (functions.hashing): every hash in these pipelines is plain
64-bit integer arithmetic (polynomial rolling hash + affine
permutations mod 2³¹−1), bit-identical in Spark and DuckDB, while
still evaluating JVM-side through Catalyst higher-order functions.

Scale design (100 TB):
- exact dedup is one hash-shuffle on a 256-bit digest — the canonical
  pick (min doc_id) rides the same aggregation;
- MinHash LSH is the scale path for near-dup: candidate generation is
  an equi-join on (band, signature) — shuffle keyed on short strings,
  no quadratic blow-up; only candidates pay the exact-Jaccard verify;
- the brute-force n-gram/SimHash/cosine pair scans here keep the
  quadratic step as a *broadcast* nested-loop over the smaller side
  and exist as verification baselines for the LSH path (and as the
  within-bucket step after blocking);
- shingle/signature generation is per-row projection work — embarrass-
  ingly parallel, no shuffle until the band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import MERSENNE_P, affine_params, poly_fingerprint_sql
from ..functions.vectors import dot as vdot, dot_sql
from ..sources import load_table

NUM_PERM = 16
BAND_ROWS = 4  # 16 perms → 4 bands × 4 rows
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 32
# Measured on the fixture corpus (shingle features): every
# Jaccard≥0.8 pair lands at hamming ≤ 5, noise explodes from 6 up.
SIMHASH_MAX_HAMMING = 5
COSINE_DUP_THRESHOLD = 0.45  # corpus max is ~0.51; no planted embedding dups


# --- exact dedup (sha2 digest groups) ---------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content digest: canonical doc
    (min doc_id) + copy count per distinct text."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.sha2(F.col("text"), 256).alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_copies"))
    )


DEDUP_EXACT_SQL = """
SELECT sha256(text) AS digest,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY sha256(text)
"""


# --- shared shingle machinery ----------------------------------------------

# Word-level hashes first, shingle combine second (two projection
# steps): char-fold each WORD once, then hash each 3-gram as
# ((w1*31+w2)*31+w3) mod p -- exact in int64 (max ~ p*993 < 2^42).
# Hashing words once and combining beats re-folding every character of
# every 3-gram string ~6x (each char would otherwise be hashed three
# times, plus concat allocations) -- higher-order-function lambdas run
# interpreted, so this constant factor dominates the dedup family's
# cost. The two-step projection matters: ``wh`` is referenced four
# times by the shingle expression, and Catalyst's CollapseProject
# keeps multiply-referenced non-trivial aliases materialized instead
# of inlining (re-computing) them.
_WORD_HASH_EXPR = f"""
  transform(filter(split(text, ' '), w -> length(w) > 0),
            w -> aggregate(filter(split(w, ''), c -> length(c) > 0),
                           CAST(0 AS BIGINT),
                           (acc, c) -> (acc * 31 + ascii(c)) % {MERSENNE_P}))
"""

# if-guard instead of a WHERE: sequence(0, n) with n<0 would produce a
# DESCENDING sequence in Spark (not an empty array), and a separate
# size filter would get pushed below the projection, duplicating wh.
_SHINGLES_FROM_WH = f"""
  if(size(wh) >= 3,
     array_distinct(transform(sequence(0, size(wh) - 3),
                    i -> ((wh[i] * 31 + wh[i+1]) * 31 + wh[i+2]) % {MERSENNE_P})),
     array(CAST(NULL AS BIGINT)))
"""

_WORD_HASHES_SQL = f"""
  list_transform(list_filter(string_split(text, ' '), w -> len(w) > 0),
                 w -> {poly_fingerprint_sql('w')})
"""

# DuckDB generate_series(1, n) is empty for n < 1 -- no guard needed.
_SHINGLE_SQL = f"""
  list_distinct(list_transform(
    generate_series(1, len(wh) - 2),
    i -> ((wh[i] * 31 + wh[i+1]) * 31 + wh[i+2]) % {MERSENNE_P}
  ))
"""


def _shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded (doc_id, shingle-hash) rows -- the normalized form all
    dedup variants aggregate from. Docs with fewer than 3 words vanish
    here (empty shingle array explodes to zero rows)."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_WORD_HASH_EXPR).alias("wh"))
        .select("doc_id", F.explode(F.expr(_SHINGLES_FROM_WH)).alias("h"))
        .where(F.col("h").isNotNull())
    )


def _docs_with_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc shingle-hash sets, materialized through an AGGREGATE.

    The groupBy is load-bearing for performance, not just shape: a
    plain projection of the shingle expression gets collapsed by
    Catalyst into whatever consumes it — in a pair join that meant the
    full shingle/hash pipeline re-evaluated PER PAIR (measured: 514 s
    for the simhash pair scan at sf0.1 vs ~2 s with the barrier).
    Expressions cannot be pushed through an Aggregate, so signatures
    are computed exactly once per document."""
    return _shingle_rows(spark, sf_dir).groupBy("doc_id").agg(
        F.collect_set("h").alias("sh")
    )


_DOCS_SHINGLES_SQL = f"""
  SELECT doc_id, {_SHINGLE_SQL} AS sh
  FROM (SELECT doc_id, {_WORD_HASHES_SQL} AS wh FROM documents)
  WHERE len(wh) >= 3
"""

_JACCARD = (
    "CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE) / size(array_union(a.sh, b.sh))"
)
_JACCARD_SQL = (
    "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh)))"
)


# --- brute-force n-gram Jaccard (verification baseline) ---------------------

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs 3-gram Jaccard ≥ τ. Quadratic by construction — the
    ground-truth baseline the LSH variant is validated against; at
    scale, run only within LSH/blocking buckets."""
    docs = _docs_with_shingles(spark, sf_dir)
    a = docs.alias("a")
    b = docs.alias("b")
    return (
        a.join(F.broadcast(b), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.expr(_JACCARD).alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


DEDUP_NGRAM_SQL = f"""
WITH docs AS ({_DOCS_SHINGLES_SQL})
SELECT a.doc_id AS doc1, b.doc_id AS doc2, {_JACCARD_SQL} AS jaccard
FROM docs a JOIN docs b ON a.doc_id < b.doc_id
WHERE {_JACCARD_SQL} >= {JACCARD_THRESHOLD}
"""


# --- MinHash + LSH (the scale path) -----------------------------------------

def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature: NUM_PERM conditional MIN
    aggregates over the exploded shingle rows — one shuffle on doc_id,
    partial+final hash aggregation, and (crucially) an Aggregate
    barrier so the signature is never inlined into downstream join
    predicates (see _docs_with_shingles)."""
    aggs = []
    for i in range(NUM_PERM):
        a, b = affine_params(i)
        aggs.append(
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"sig{i}")
        )
    return _shingle_rows(spark, sf_dir).groupBy("doc_id").agg(*aggs)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    Candidate generation: band the signature (4 bands × 4 rows),
    explode to (band_idx, band_key) and self-equi-join — a plain
    shuffle join on short keys, linear in data + candidates. Verify:
    exact Jaccard on the candidates only, keep ≥ τ.
    """
    sigs = minhash_signatures(spark, sf_dir)
    n_bands = NUM_PERM // BAND_ROWS
    band_keys = F.array(
        *[
            F.concat_ws(",", *[F.col(f"sig{b * BAND_ROWS + r}") for r in range(BAND_ROWS)])
            for b in range(n_bands)
        ]
    )
    banded = sigs.select("doc_id", F.posexplode(band_keys).alias("band_idx", "band_key"))
    a = banded.alias("ba")
    b = banded.alias("bb")
    candidates = (
        a.join(
            b,
            (F.col("ba.band_idx") == F.col("bb.band_idx"))
            & (F.col("ba.band_key") == F.col("bb.band_key"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc1"), F.col("bb.doc_id").alias("doc2"))
        .distinct()
    )
    docs = _docs_with_shingles(spark, sf_dir)
    return (
        candidates.join(docs.alias("a"), F.col("doc1") == F.col("a.doc_id"))
        .join(docs.alias("b"), F.col("doc2") == F.col("b.doc_id"))
        .select("doc1", "doc2", F.expr(_JACCARD).alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _minhash_sql() -> str:
    perms = ", ".join(
        f"({i}, {affine_params(i)[0]}, {affine_params(i)[1]})" for i in range(NUM_PERM)
    )
    return f"""
WITH docs AS ({_DOCS_SHINGLES_SQL}),
perms(i, a, b) AS (VALUES {perms}),
hashes AS (SELECT doc_id, unnest(sh) AS h FROM docs),
sigs AS (
  SELECT doc_id, p.i, MIN((h * p.a + p.b) % {MERSENNE_P}) AS minv
  FROM hashes CROSS JOIN perms p
  GROUP BY doc_id, p.i
),
bands AS (
  SELECT doc_id, i // {BAND_ROWS} AS band_idx,
         string_agg(CAST(minv AS VARCHAR), ',' ORDER BY i) AS band_key
  FROM sigs GROUP BY doc_id, i // {BAND_ROWS}
),
cands AS (
  SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id
)
SELECT doc1, doc2, {_JACCARD_SQL} AS jaccard
FROM cands
JOIN docs a ON doc1 = a.doc_id
JOIN docs b ON doc2 = b.doc_id
WHERE {_JACCARD_SQL} >= {JACCARD_THRESHOLD}
"""


DEDUP_MINHASH_SQL = _minhash_sql()


# --- SimHash ----------------------------------------------------------------

_SIMHASH_SQL = f"""
  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(0, {SIMHASH_BITS - 1}), k -> CAST({SIMHASH_BITS - 1} AS BIGINT) - k)),
    (acc, j) -> acc * 2 + (CASE WHEN
      list_reduce(list_prepend(CAST(0 AS BIGINT), sh),
        (a3, h) -> a3 + 2 * ((h >> j) & 1) - 1
      ) > 0 THEN 1 ELSE 0 END)
  )
"""


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash over the distinct 3-gram shingle hashes (the same
    feature set as MinHash): bit j set iff Σ_shingles (2·bit_j(h)−1)
    > 0. Shingle features (not unigrams) are load-bearing — this
    corpus is word-shuffled text over a shared vocabulary, and a
    unigram simhash is near permutation-invariant (measured: 29k
    false pairs at hamming ≤ 4 vs ~30 true ones).

    Shape: 32 conditional SUM aggregates over the exploded shingle
    rows (one per bit), packed into the hash by constant powers of two
    in the post-aggregation projection — one shuffle, and the
    Aggregate barrier keeps the hash from being re-derived per pair in
    the downstream join (the 514 s → ~2 s fix)."""
    bit_sums = [
        F.sum(2 * (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))) - 1).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    packed = sum(
        (F.col(f"b{j}") > 0).cast("long") * F.lit(1 << j) for j in range(SIMHASH_BITS)
    )
    return (
        _shingle_rows(spark, sf_dir)
        .groupBy("doc_id")
        .agg(*bit_sums)
        .select("doc_id", packed.alias("simhash"))
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ k. Pair scan here is
    brute-force over 64-bit ints (cheap broadcast NLJ); at scale, block
    on simhash byte-chunks first (pigeonhole: ≤k differing bits over
    c>k chunks leaves an identical chunk to equi-join on)."""
    docs = simhash_docs(spark, sf_dir)
    a = docs.alias("a")
    b = docs.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("long")
    return (
        a.join(F.broadcast(b), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


DEDUP_SIMHASH_SQL = f"""
WITH base AS ({_DOCS_SHINGLES_SQL}),
docs AS (SELECT doc_id, {_SIMHASH_SQL} AS simhash FROM base)
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM docs a JOIN docs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


# --- embedding-cosine near-dup ----------------------------------------------

def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: pairs with cosine ≥ τ. Unit-normalized
    vectors behind an aggregation barrier (cosine == dot, computed
    once per pair — see operators/similarity.py); brute-force pair
    scan as baseline, sign-LSH bucketing is the scale path."""
    from .similarity import _unit_vectors

    e = _unit_vectors(spark, sf_dir)
    a = e.alias("a")
    b = e.alias("b")
    cos = vdot(F.col("a.v"), F.col("b.v"))
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec1"),
            F.col("b.vec_id").alias("vec2"),
            cos.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= COSINE_DUP_THRESHOLD)
    )


def _dedup_embedding_sql() -> str:
    from .similarity import _UNIT_VECTORS_SQL

    return f"""
WITH e AS ({_UNIT_VECTORS_SQL})
SELECT a.vec_id AS vec1, b.vec_id AS vec2, {dot_sql('a.v', 'b.v')} AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {dot_sql('a.v', 'b.v')} >= {COSINE_DUP_THRESHOLD}
"""


DEDUP_EMBEDDING_SQL = _dedup_embedding_sql()


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_NGRAM_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, DEDUP_EMBEDDING_SQL),
}
