"""Embedding near-duplicate dedup at a REAL dup threshold (cos ≥ 0.9)
over a planted-near-dup corpus (VERDICT r02 ask #4 / r03 next-round #4).

The fixture corpus has no embedding duplicates (max organic cosine
~0.51), so ``dedup.embedding_similar_pairs`` demonstrates the banded
plumbing at a deliberately weak τ=0.40 — not the dedup use-case. This
module DERIVES a near-dup corpus from the fixture deterministically
(so it works at any SF and needs nothing outside the testdata), then
runs the banded sign-LSH dedup at cos ≥ 0.9:

- Plant: for the first ``NEARDUP_N`` vec_ids, add a copy at
  ``vec_id + NEARDUP_ID_OFFSET`` perturbed by pseudo-noise of relative
  norm exactly ``NEARDUP_REL_NOISE`` (md5-seeded per (vec_id, dim) —
  deterministic, JVM-side, no RNG state). cos(v, v+d) ≥ (1−r)/(1+r)
  for r = ‖d‖/‖v‖, so r = 0.04 GUARANTEES cos ≥ 0.923 > 0.9 for every
  planted pair, while organic pairs stay ≤ ~0.51 — the threshold
  separates dup from non-dup with margin on both sides (typical
  planted cosine ≈ 1 − r²/2 ≈ 0.999).
- The corpus is written once per sf_dir under ``spark-warehouse/``
  (idempotent; same augmented-table shape a real pipeline would stage)
  and the DuckDB oracle reads the same parquet via a lazy callable
  oracle — the banded semantics are hash-checked end to end.
- Recall at the real threshold: the 8×5 band math gives per-pair miss
  probability (1 − p⁵)⁸ ≈ 1e-10 at cos 0.999 (p = 1 − θ/π ≈ 0.987),
  so the pytest asserts the result is EXACTLY the planted pair set —
  measured recall 1.0, no false positives.

Scale: generation is one linear projection + union + write; the dedup
itself is the banded equi-join shape (see similarity.py) — both are
the plans a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.vectors import (
    as_double,
    dot_sql,
    norm,
    normalized,
    normalized_sql,
    dot as vdot,
)
from ..functions.barrier import barrier
from ..sources import load_table
from ..sources.staging import is_staged, staged_path
from .similarity import projection_bands_sql

EMB_DIM = 64  # fixture embedding dimension (TESTDATA.md)

NEARDUP_N = 50
NEARDUP_ID_OFFSET = 1_000_000
NEARDUP_REL_NOISE = 0.04  # r: cos ≥ (1−r)/(1+r) = 0.923 guaranteed
DEDUP_COS_THRESHOLD = 0.9

# Adaptive band geometry (r10 — the same key_bits ∝ log₂N law the
# simhash blocking executes; SCALE.md band-key sizing). Random-pair
# collisions ∝ bands·N²/2^bits, so bits must grow with the corpus;
# recall at the 0.9 decision boundary is held ≥0.99 by growing bands
# with bits per the banding law (p = 1 − acos(0.9)/π = 0.8564:
# 24×10 → 1−(1−p¹⁰)²⁴ = 0.997; 38×14 → 1−(1−p¹⁴)³⁸ = 0.990;
# 73×18 → 1−(1−p¹⁸)⁷³ = 0.990; planted pairs at cos ≈ 0.999 miss
# with prob ≤ ~1e-21 in every geometry). Collision factor drops
# 24/2¹⁰ = 0.0234 → 38/2¹⁴ = 0.0023 → 73/2¹⁸ = 0.00028 (~8-10× per
# point) for ≤2× more blocking rows per point. Every geometry is
# gate-checkable: the lazy oracle derives the SAME config from the
# same corpus count. The third point exists because the r12 100×
# probe (200k vectors) caught the table SATURATING at (38,14): chance
# candidates grow with C(n,2)·bands/2^bits, so a fixed key width one
# decade past its ceiling made the band self-join candidate-bound
# (the same failure mode the 32-bit simhash noise floor measured) —
# key bits must keep growing ≈ log₂N forever, table-stepped here.
# Beyond these points the literal sign-bank expression gets
# plan-heavy (bands·bits·dim literals) — the documented next step at
# 10⁸+ vectors is hashed band keys instead of literal banks.
NEARDUP_BAND_CONFIGS: tuple[tuple[int | None, tuple[int, int]], ...] = (
    (12_000, (24, 10)),
    (120_000, (38, 14)),
    (None, (73, 18)),
)


def _neardup_band_geometry(n_vectors: int) -> tuple[int, int]:
    for ceiling, geo in NEARDUP_BAND_CONFIGS:
        if ceiling is None or n_vectors <= ceiling:
            return geo
    raise AssertionError("unreachable: last config has no ceiling")


def neardup_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "neardup_embeddings", "embeddings")


def build_neardup_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently stage the augmented corpus (originals + planted
    near-dups) as parquet; returns the directory path. All derivation
    is JVM-side and deterministic: noise g_i ∈ [−0.5, 0.5) comes from
    md5(vec_id, dim), is unit-normalized, and is added at exactly
    ``NEARDUP_REL_NOISE``·‖v‖, so re-generation is bit-identical. The
    path embeds the source fingerprint (sources.staging), so a
    regenerated testdata invalidates stale stagings."""
    path = neardup_corpus_path(sf_dir)
    if is_staged(path):
        return path
    emb = load_table(spark, sf_dir, "embeddings")
    # Planted ids live at vec_id + NEARDUP_ID_OFFSET; if the organic
    # table ever reaches the offset (larger SF), ids would silently
    # collide and corrupt the planted-pair contract (ADVICE r4).
    # one action for both staging stats (ADVICE r12: count was a
    # second full pass)
    max_id, n_organic = emb.agg(F.max("vec_id"), F.count("*")).first()
    if max_id is not None and max_id >= NEARDUP_ID_OFFSET:
        raise ValueError(
            f"embeddings.vec_id max {max_id} >= NEARDUP_ID_OFFSET "
            f"{NEARDUP_ID_OFFSET}: planted near-dup ids would collide; "
            "raise the offset before staging this corpus"
        )
    v = as_double(F.col("embedding"))
    # per-(vec_id, dim) pseudo-noise: first 8 md5 hex digits → [0,1) → [−.5,.5)
    g = F.transform(
        v,
        lambda _, i: (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("_", F.col("vec_id"), i.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("double")
            / F.lit(4294967296.0)
            - F.lit(0.5)
        ),
    )
    amp = F.lit(NEARDUP_REL_NOISE) * norm(v) / norm(g)
    perturbed = F.zip_with(v, g, lambda x, u: x + amp * u)
    dups = (
        emb.where(F.col("vec_id") < NEARDUP_N)
        .select(
            (F.col("vec_id") + NEARDUP_ID_OFFSET).alias("vec_id"),
            F.transform(perturbed, lambda x: x.cast("float")).alias("embedding"),
            "label",
        )
    )
    # File count grows with the corpus (≈8k vectors per file, capped):
    # a coalesce(1) staging at fixture scale was fine, but one task
    # writing one row group makes the staged file UNSPLITTABLE — every
    # downstream scan (normalize, banding) then runs single-task no
    # matter how many byte-range partitions the reader plans. The r12
    # 100× probe measured it: 12 of 13 read tasks got 0 records.
    # Sized from the WRITTEN row count (organic + planted — ADVICE
    # r12: sizing from organic alone drifted rows/file above the
    # target near the ceiling).
    n_rows = (n_organic or 0) + min(NEARDUP_N, n_organic or 0)
    n_files = max(1, min(64, n_rows // 8192))
    emb.select("vec_id", "embedding", "label").unionByName(dups).repartition(
        n_files
    ).write.mode("overwrite").parquet(path)
    return path


_NEARDUP_INDEX_CACHE: dict[tuple, DataFrame] = {}


def _neardup_unit_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once unit-vector index over the planted near-dup corpus,
    memoized per (application, sf_dir) — the same r7 pattern as
    ``similarity.unit_vector_index`` / ``semdedup._assigned_index``:
    repeated calls reuse executor-resident blocks."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _NEARDUP_INDEX_CACHE.get(key)
    if cached is None:
        corpus = spark.read.parquet(build_neardup_corpus(spark, sf_dir))
        cached = barrier(
            corpus.select(
                "vec_id", normalized(as_double(F.col("embedding"))).alias("vn")
            )
            .groupBy("vec_id")
            .agg(F.first("vn").alias("v")),
            "corpus",
            "embedding_dedup unit-vector index",
        )
        _NEARDUP_INDEX_CACHE[key] = cached
    return cached


def _neardup_corpus_count(spark: SparkSession, sf_dir: str) -> int:
    """Vector count of the staged corpus (parquet-metadata cheap),
    memoized — drives the adaptive band geometry on BOTH engines."""
    key = (spark.sparkContext.applicationId, sf_dir, "count")
    cached = _NEARDUP_INDEX_CACHE.get(key)
    if cached is None:
        cached = spark.read.parquet(build_neardup_corpus(spark, sf_dir)).count()
        _NEARDUP_INDEX_CACHE[key] = cached
    return cached


def _neardup_band_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The projection-band LSH index over the planted corpus,
    materialized + memoized like the unit-vector index: the bank's
    Rademacher dots per vector are paid once per (application,
    sf_dir), not once per action — this banded table IS the ANN index
    a production deployment persists. Geometry is corpus-adaptive
    (see NEARDUP_BAND_CONFIGS)."""
    bands, bits = _neardup_band_geometry(_neardup_corpus_count(spark, sf_dir))
    key = (spark.sparkContext.applicationId, sf_dir, "bands", bands, bits)
    cached = _NEARDUP_INDEX_CACHE.get(key)
    if cached is None:
        from .similarity import projection_banded_from

        cached = barrier(
            projection_banded_from(
                _neardup_unit_index(spark, sf_dir), EMB_DIM, bands, bits
            ),
            "corpus",
            "embedding_dedup projection band index",
        )
        _NEARDUP_INDEX_CACHE[key] = cached
    return cached


def embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded LSH dedup at cos ≥ 0.9 over the planted corpus: the
    same equi-join-on-(band_idx, band_key) shape as
    ``dedup.embedding_similar_pairs``, PROMOTED (r8) to the
    random-projection bank (``similarity.projection_banded_from``)
    and, r10, to corpus-ADAPTIVE geometry (NEARDUP_BAND_CONFIGS —
    band-key bits grow with log₂N so the random-collision candidate
    term stays bounded; bands grow with bits so recall at the 0.9
    boundary stays ≥0.99, and the planted pairs at cos ≈ 0.999 are
    found with miss probability ~1e-21 in every geometry; both
    measured via the forced-geometry pytest). Exact cosine on
    candidates only."""
    e = _neardup_unit_index(spark, sf_dir)
    banded = _neardup_band_index(spark, sf_dir)
    # Corpus × corpus joins: pin SHUFFLE_HASH — Catalyst's size
    # estimates under the band explode would broadcast a corpus-sized
    # side (r10 audit, see dedup.dedup_ngram_jaccard).
    a = banded.alias("a").hint("shuffle_hash")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec1"), F.col("b.vec_id").alias("vec2"))
        .distinct()
    )
    # Two fetch joins, SHUFFLE_HASH-pinned — NOT functions.pairs'
    # one-shuffle fetch: this family is in the C ≫ N regime (measured
    # sf1: 5.1M candidates vs 20k vectors — band-occupancy collisions),
    # where pair-fetch moves 2C payload rows through its pivot
    # aggregate (measured 23 s) while the two-join form moves C
    # (measured ~4.8 s). The index shuffles are O(N) — noise here.
    return (
        cands.join(
            e.alias("e1").hint("shuffle_hash"), F.col("vec1") == F.col("e1.vec_id")
        )
        .join(
            e.alias("e2").hint("shuffle_hash"), F.col("vec2") == F.col("e2.vec_id")
        )
        .select("vec1", "vec2", vdot(F.col("e1.v"), F.col("e2.v")).alias("cos_sim"))
        .where(F.col("cos_sim") >= DEDUP_COS_THRESHOLD)
    )


def embedding_dedup_oracle(sf_dir: str) -> str:
    """Lazy DuckDB twin: reads the SAME staged parquet and mirrors the
    banded candidate generation + exact cosine term-for-term (the
    functions.vectors determinism contract), so the declared banded
    semantics — not a quadratic scan — are what the gate hashes. The
    adaptive geometry is derived from the SAME corpus count the Spark
    side uses, so both engines band identically at every scale."""
    from ..session import active_or_local

    spark = active_or_local("embedding_dedup_oracle")
    path = build_neardup_corpus(spark, sf_dir)
    bands_n, bits = _neardup_band_geometry(_neardup_corpus_count(spark, sf_dir))
    rel = f"read_parquet('{path}/*.parquet')"
    # the projection-band twin mirrors similarity.projection_banded_from
    # bit-for-bit (±1 products are lossless; both engines fold
    # left-to-right — parity asserted in tests/test_projection_lsh.py)
    return f"""
WITH raw AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM {rel}),
e AS (SELECT vec_id, {normalized_sql('v')} AS v FROM raw),
keyed AS (SELECT vec_id,
                 {projection_bands_sql('v', EMB_DIM, bands_n, bits)} AS ks
          FROM e),
bands AS (
  SELECT vec_id, u.band_idx - 1 AS band_idx, ks[u.band_idx] AS band_key
  FROM keyed, (SELECT unnest(generate_series(1, {bands_n})) AS band_idx) u
),
cands AS (
  SELECT DISTINCT a.vec_id AS vec1, b.vec_id AS vec2
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.vec_id < b.vec_id
)
SELECT vec1, vec2, {dot_sql('e1.v', 'e2.v')} AS cos_sim
FROM cands
JOIN e e1 ON vec1 = e1.vec_id
JOIN e e2 ON vec2 = e2.vec_id
WHERE {dot_sql('e1.v', 'e2.v')} >= {DEDUP_COS_THRESHOLD}
"""


QUERIES = {
    "embedding_dedup": (embedding_dedup, embedding_dedup_oracle),
}
