"""Image perceptual-hash near-dup dedup (r11 — VERDICT r10 ask #4):
blocked==bruteforce at every config, planted recall, cross-format
invariance, and kernel/pure-Python dHash agreement."""

from __future__ import annotations

import numpy as np
import pytest

from robin_sparkles_spark.operators import image_dedup as I


def _pairs(df):
    return {
        (r.img1, r.img2, r.hamming)
        for r in df.select("img1", "img2", "hamming").collect()
    }


def test_blocked_equals_bruteforce_every_config(spark, sf_dir):
    """The pigeonhole guarantee is config-independent: every declared
    chunk layout yields the IDENTICAL exact pair set as the all-pairs
    hamming scan."""
    truth = _pairs(I.dedup_image_phash_bruteforce(spark, sf_dir))
    assert truth, "fixture must contain planted near-dup pairs"
    from robin_sparkles_spark.operators.dedup import hamming_blocked_pairs

    hashes = I.image_dhash(spark, sf_dir)
    for _ceiling, widths in I.IMAGE_BLOCK_CONFIGS:
        got = _pairs(
            hamming_blocked_pairs(
                hashes,
                widths,
                I.IMAGE_MAX_HAMMING,
                id_col="img_id",
                hash_col="dhash",
                out_cols=("img1", "img2", "hamming"),
            )
        )
        assert got == truth, f"config {widths} diverged"


def test_planted_pairs_recovered(spark, sf_dir):
    """Recall 1.0 on the planted fixture: every 3-pixel perturbed
    variant pairs with its base at hamming ≤ 6 (the structural bound:
    ≤ 3 touched grid cells × ≤ 2 comparisons each), and every PNG
    re-encode pairs with its base at hamming == 0 (format
    invariance)."""
    got = {(a, b): h for a, b, h in _pairs(I.dedup_image_phash(spark, sf_dir))}
    n = (
        spark.read.parquet(I.stage_image_corpus(spark, sf_dir))
        .where("variant = 0")
        .count()
    )
    for i in range(n):
        if i % 5 == 0:
            assert (i * 10, i * 10 + 1) in got, f"perturbed pair {i} missed"
            assert got[(i * 10, i * 10 + 1)] <= I.IMAGE_MAX_HAMMING
        if i % 7 == 0:
            assert got.get((i * 10, i * 10 + 2)) == 0, f"png twin {i} not 0"


def test_dhash_format_invariant_and_kernel_exact(spark, sf_dir):
    """The Spark kernel's hashes equal a driver-side pure-Python
    recompute from the closed-form pixels, and the BMP/PNG encodings
    of the same pixels decode to identical pixels → identical hashes."""
    from robin_sparkles_spark.operators.media_decode import (
        bmp_pixels,
        png_pixels,
    )

    got = {
        r.img_id: r.dhash
        for r in I.image_dhash(spark, sf_dir).collect()
    }
    n_base = sum(1 for k in got if k % 10 == 0)
    assert n_base >= 10
    for i in range(0, min(n_base, 35)):
        base_px = I._image_pixels(i, 0)
        assert got[i * 10] == I.dhash_of_pixels(base_px)
        assert np.array_equal(bmp_pixels(I._encode_bmp(base_px)), base_px)
        if i % 7 == 0:
            assert np.array_equal(
                png_pixels(I._encode_png(base_px, i)), base_px
            )
            assert got[i * 10 + 2] == got[i * 10]
        if i % 5 == 0:
            assert got[i * 10 + 1] == I.dhash_of_pixels(I._image_pixels(i, 1))


def test_perturbation_structural_hamming_bound():
    """The planted perturbation's hamming bound holds by construction
    for arbitrary ids — 3 pixels → ≤ 3 cells → ≤ 6 bits — checked
    directly on the pure hash (no Spark)."""
    for i in range(0, 60, 5):
        h0 = I.dhash_of_pixels(I._image_pixels(i, 0))
        h1 = I.dhash_of_pixels(I._image_pixels(i, 1))
        assert bin(h0 ^ h1).count("1") <= I.IMAGE_MAX_HAMMING


def test_unrelated_images_far_apart():
    """Different base images decorrelate: no two of the first 40 base
    hashes fall within 2× the dedup threshold (multiplicative id
    mixing in the channel formulas — an additive id term would make
    every image a near-dup of every other)."""
    hashes = [I.dhash_of_pixels(I._image_pixels(i, 0)) for i in range(40)]
    close = [
        (a, b)
        for a in range(40)
        for b in range(a + 1, 40)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 2 * I.IMAGE_MAX_HAMMING
    ]
    assert not close, f"unexpectedly correlated base images: {close[:5]}"


def test_dhash_rejects_degenerate_grid():
    """Images narrower than the grid raise instead of hashing with
    empty cells (the corpus contract keeps w ≥ 12 > 9, h ≥ 9 > 8)."""
    tiny = np.zeros((3, 4, 3), np.int64)
    with pytest.raises(ValueError, match="empty dHash grid"):
        I.dhash_of_pixels(tiny)


def test_incremental_matches_planted_structure(spark, sf_dir):
    """dedup_image_incremental: variants of indexed families match
    their base (perturbed at 1..6, PNG re-encode at 0); everything in
    a % 4 == 3 family is genuinely new vs the index (its base is not
    indexed, and within-batch dups are out of contract)."""
    rows = {
        r.img_id: r
        for r in I.dedup_image_incremental(spark, sf_dir).collect()
    }
    assert rows
    for img_id, r in rows.items():
        fam, v = img_id // 10, img_id % 10
        if fam % 4 == 3:
            assert not r.is_dup and r.dup_of == -1 and r.hamming == -1, (
                f"new-family item {img_id} wrongly matched {r.dup_of}"
            )
        else:
            assert v != 0, "index items must not appear in the batch"
            assert r.is_dup and r.dup_of == fam * 10, (
                f"re-upload {img_id} missed its base"
            )
            if v == 2:
                assert r.hamming == 0  # PNG re-encode: format-invariant
            else:
                assert 0 <= r.hamming <= I.IMAGE_MAX_HAMMING


from hypothesis import given, settings
from hypothesis import strategies as st
import numpy as np


@st.composite
def _gray_images(draw):
    w = draw(st.integers(min_value=9, max_value=40))
    h = draw(st.integers(min_value=8, max_value=30))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.int64)


@settings(max_examples=40, deadline=None)
@given(_gray_images(), st.integers(min_value=1, max_value=9),
       st.integers(min_value=0, max_value=500))
def test_dhash_illumination_invariance(gray, gain, offset):
    """dHash's comparisons are cross-multiplied cell means, so they
    are structurally invariant to any positive gain and any uniform
    brightness offset — the documented perceptual-hash property
    (illumination changes must not defeat near-dup detection)."""
    base = I.dhash_of_gray(gray)
    assert I.dhash_of_gray(gray * gain) == base
    assert I.dhash_of_gray(gray + offset) == base
    assert I.dhash_of_gray(gray * gain + offset) == base


@settings(max_examples=40, deadline=None)
@given(_gray_images())
def test_dhash_row_permutation_changes_hash(gray):
    """Sanity against a degenerate kernel: a content change (vertical
    flip of a non-symmetric image) must generally move the hash —
    dHash is not a constant function of dims."""
    flipped = gray[::-1].copy()
    if np.array_equal(flipped, gray):
        return
    # not asserted unequal per-example (flips CAN collide; a uniform
    # x-gradient image is flip-invariant by construction); assert on
    # a deterministic unstructured concrete case instead
    px = np.random.default_rng(7).integers(
        0, 256, size=(12, 18), dtype=np.int64
    )
    assert I.dhash_of_gray(px[::-1].copy()) != I.dhash_of_gray(px)
