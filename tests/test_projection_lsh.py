"""Random-projection LSH bank (r8 prototype — SCALE.md band-key
sizing law): engine-exact keys, planted-pair recall, and the
candidate-count reduction that motivates it."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from robin_sparkles_spark.operators import embedding_dedup as ed
from robin_sparkles_spark.operators import similarity as S
from robin_sparkles_spark.operators.embedding_dedup import (
    DEDUP_COS_THRESHOLD,
    _neardup_unit_index,
    build_neardup_corpus,
)
from robin_sparkles_spark.functions.vectors import as_double, dot, normalized

DIM = 64


def test_projection_band_keys_engine_parity(spark, sf_dir):
    """The Spark fold and the DuckDB twin produce BIT-IDENTICAL keys
    for every vector (±1 products are lossless; both engines fold
    left-to-right) — the property that lets a promoted projection
    index keep full hash-gated oracles."""
    bands, bits = 4, 10  # small geometry: 40 projections
    e = S._unit_vectors(spark, sf_dir)
    got = {
        (r.vec_id, r.band_idx, r.band_key)
        for r in S.projection_banded_from(e, DIM, bands, bits).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    sql = f"""
    WITH e AS ({S._UNIT_VECTORS_SQL}),
    keys AS (SELECT vec_id,
             {S.projection_bands_sql('v', DIM, bands, bits)} AS ks FROM e)
    SELECT vec_id, u.band_idx - 1 AS band_idx, ks[u.band_idx] AS band_key
    FROM keys, (SELECT unnest(generate_series(1, {bands})) AS band_idx) u
    """
    want = {(int(a), int(b), int(c)) for a, b, c in con.execute(sql).fetchall()}
    assert got == want
    assert len(got) == bands * e.count()


def test_projection_banding_recall_and_candidate_reduction(spark, sf_dir):
    """Over the planted near-dup corpus (cos ≥ 0.923 guaranteed): the
    24×10 projection bank keeps ≥95% recall of the true cos ≥ 0.9
    pairs (theory: per-bit p ≈ 0.87 → band 0.26 → 24 bands ≈ 0.999)
    while generating FEWER candidate pairs than the 8×5 dim-sign
    banding — wider keys beat wider collisions."""
    build_neardup_corpus(spark, sf_dir)
    e = _neardup_unit_index(spark, sf_dir)

    def candidates(banded):
        a, b = banded.alias("a"), banded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("v1"), F.col("b.vec_id").alias("v2")
            )
            .distinct()
        )

    sign_cands = candidates(S.sign_banded_from(e))
    proj_cands = candidates(S.projection_banded_from(e, DIM))

    # ground truth: exact threshold pairs via the verified sign-banded
    # query is NOT usable as truth (it shares the sign candidates), so
    # verify each candidate set against the exact cosine and compare
    # coverage of the union of true pairs found by either.
    def verified(cands):
        return {
            (r.v1, r.v2)
            for r in cands.join(
                e.alias("e1"), F.col("v1") == F.col("e1.vec_id")
            )
            .join(e.alias("e2"), F.col("v2") == F.col("e2.vec_id"))
            .select(
                "v1", "v2",
                dot(F.col("e1.v"), F.col("e2.v")).alias("cs"),
            )
            .where(F.col("cs") >= DEDUP_COS_THRESHOLD)
            .collect()
        }

    true_sign = verified(sign_cands)
    true_proj = verified(proj_cands)
    truth = true_sign | true_proj
    assert truth, "planted corpus must contain cos >= 0.9 pairs"
    assert len(true_proj) >= 0.95 * len(truth), (len(true_proj), len(truth))

    n_sign, n_proj = sign_cands.count(), proj_cands.count()
    assert n_proj < n_sign, (n_proj, n_sign)


@pytest.mark.parametrize(
    "geometry", [g for _, g in ed.NEARDUP_BAND_CONFIGS],
    ids=lambda g: f"b{g[0]}x{g[1]}",
)
def test_embedding_dedup_every_geometry_finds_planted_pairs(
    spark, sf_dir, geometry
):
    """The r10 adaptive-geometry contract: EVERY configured
    (bands, bits) point must recover the exact planted pair set at
    cos ≥ 0.9 (planted cosines ≈ 0.999 → per-geometry miss
    probability ~1e-21), and the wider geometry must generate no MORE
    candidate pairs than the narrow one (collisions ∝ bands/2^bits
    shrink 10×; at fixture scale the candidate sets are structured,
    so assert ≤, not <)."""
    bands, bits = geometry
    build_neardup_corpus(spark, sf_dir)
    e = _neardup_unit_index(spark, sf_dir)
    banded = S.projection_banded_from(e, DIM, bands, bits)
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("v1"), F.col("b.vec_id").alias("v2"))
        .distinct()
    )
    found = {
        (r.v1, r.v2)
        for r in cands.join(e.alias("e1"), F.col("v1") == F.col("e1.vec_id"))
        .join(e.alias("e2"), F.col("v2") == F.col("e2.vec_id"))
        .select("v1", "v2", dot(F.col("e1.v"), F.col("e2.v")).alias("cs"))
        .where(F.col("cs") >= DEDUP_COS_THRESHOLD)
        .collect()
    }
    n_planted = min(
        ed.NEARDUP_N,
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count(),
    )
    expected = {
        (i, i + ed.NEARDUP_ID_OFFSET) for i in range(n_planted)
    }
    assert found == expected


def test_embedding_dedup_geometry_selection():
    """key bits grow with log2(N): ceilings ordered, selector total,
    bits strictly increasing across configs."""
    ceilings = [c for c, _ in ed.NEARDUP_BAND_CONFIGS[:-1]]
    assert ceilings == sorted(ceilings)
    assert ed.NEARDUP_BAND_CONFIGS[-1][0] is None
    bits = [b for _, (_, b) in ed.NEARDUP_BAND_CONFIGS]
    assert bits == sorted(set(bits))
    assert ed._neardup_band_geometry(1) == ed.NEARDUP_BAND_CONFIGS[0][1]
    assert (
        ed._neardup_band_geometry(10**9) == ed.NEARDUP_BAND_CONFIGS[-1][1]
    )


@pytest.mark.parametrize("bands,bits", [(4, 10), (24, 10), (38, 14), (73, 18)])
def test_hashed_bank_matches_literal_bank_bitwise(spark, sf_dir, bands, bits):
    """VERDICT r13 #2: the hashed projection bank recomputes the ±1
    signs in-plan from the affine family instead of embedding a
    bands·bits·dim literal matrix — keys must be BIT-IDENTICAL to the
    literal bank at every geometry (same sign family, same left fold),
    so the above-threshold dispatch is invisible to oracles."""
    e = S._unit_vectors(spark, sf_dir).limit(40)
    lit = {
        (r.vec_id, r.band_idx, r.band_key)
        for r in e.select(
            "vec_id",
            F.posexplode(
                S.projection_band_keys_expr(DIM, bands, bits)
            ).alias("band_idx", "band_key"),
        ).collect()
    }
    hashed = {
        (r.vec_id, r.band_idx, r.band_key)
        for r in e.select(
            "vec_id",
            F.posexplode(
                S.projection_band_keys_hashed_expr(DIM, bands, bits)
            ).alias("band_idx", "band_key"),
        ).collect()
    }
    assert hashed == lit
    assert len(hashed) == bands * 40


def test_hashed_bank_plan_size_is_geometry_independent(spark):
    """The point of the hashed bank: the expression (and therefore
    the Catalyst plan fragment) must not grow with the band geometry.
    The literal bank at (73,18) embeds 84k doubles; the hashed one
    stays O(1)."""
    small = str(S.projection_band_keys_hashed_expr(DIM, 4, 10))
    wide = str(S.projection_band_keys_hashed_expr(DIM, 73, 18))
    assert abs(len(wide) - len(small)) < 50  # only the digit widths differ
    lit_wide = str(S.projection_band_keys_expr(DIM, 73, 18))
    assert len(lit_wide) > 100 * len(wide)


def test_banded_from_dispatches_above_literal_cap(spark, sf_dir):
    """projection_banded_from must keep the literal bank at the base
    geometry (gate plans unchanged) and switch to the hashed bank
    above LITERAL_BANK_MAX_PROJECTIONS — checked via the analyzed
    plan's expression footprint, not implementation internals: the
    literal bank's plan string carries the sign matrix, the hashed
    one stays small."""
    e = S._unit_vectors(spark, sf_dir).limit(8)
    base = S.projection_banded_from(e, DIM, 24, 10)
    wide = S.projection_banded_from(e, DIM, 38, 14)
    base_plan = base._jdf.queryExecution().analyzed().toString()
    wide_plan = wide._jdf.queryExecution().analyzed().toString()
    assert len(wide_plan) < len(base_plan)
    # and both still compute: 8 vectors × bands rows
    assert base.count() == 24 * 8
    assert wide.count() == 38 * 8
