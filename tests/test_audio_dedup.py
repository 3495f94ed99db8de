"""Audio acoustic-fingerprint near-dup dedup (r11): blocked==
bruteforce at every config, planted recall, loudness invariance, and
kernel/pure-Python fingerprint agreement."""

from __future__ import annotations

import numpy as np
import pytest

from robin_sparkles_spark.operators import audio_dedup as AU


def _pairs(df):
    return {
        (r.aud1, r.aud2, r.hamming)
        for r in df.select("aud1", "aud2", "hamming").collect()
    }


def test_blocked_equals_bruteforce_every_config(spark, sf_dir):
    truth = _pairs(AU.dedup_audio_fingerprint_bruteforce(spark, sf_dir))
    assert truth, "fixture must contain planted near-dup pairs"
    from robin_sparkles_spark.operators.dedup import hamming_blocked_pairs

    fps = AU.audio_fingerprints(spark, sf_dir)
    for _ceiling, widths in AU.AUDIO_BLOCK_CONFIGS:
        got = _pairs(
            hamming_blocked_pairs(
                fps,
                widths,
                AU.AUDIO_MAX_HAMMING,
                id_col="aud_id",
                hash_col="fp",
                out_cols=("aud1", "aud2", "hamming"),
            )
        )
        assert got == truth, f"config {widths} diverged"


def test_planted_pairs_recovered(spark, sf_dir):
    """Recall 1.0: every 3-sample perturbed variant pairs with its
    base at hamming ≤ 6 (structural bound), and every exact 2×-gain
    copy pairs at hamming == 0 (loudness invariance — energy-ratio
    comparisons are scale-free)."""
    got = {
        (a, b): h
        for a, b, h in _pairs(AU.dedup_audio_fingerprint(spark, sf_dir))
    }
    n = (
        spark.read.parquet(AU.stage_audio_corpus(spark, sf_dir))
        .where("variant = 0")
        .count()
    )
    for i in range(n):
        if i % 5 == 0:
            assert (i * 10, i * 10 + 1) in got, f"perturbed pair {i} missed"
            assert got[(i * 10, i * 10 + 1)] <= AU.AUDIO_MAX_HAMMING
        if i % 7 == 0:
            assert got.get((i * 10, i * 10 + 2)) == 0, f"gain copy {i} not 0"


def test_fingerprint_kernel_exact(spark, sf_dir):
    """The Spark kernel's fingerprints equal a driver-side pure-Python
    recompute from the closed-form samples."""
    got = {
        r.aud_id: r.fp for r in AU.audio_fingerprints(spark, sf_dir).collect()
    }
    for i in range(0, 35):
        s0 = np.array(AU._clip_samples(i, 0), np.int64)
        assert got[i * 10] == AU.fingerprint_of_samples(s0)
        if i % 5 == 0:
            s1 = np.array(AU._clip_samples(i, 1), np.int64)
            assert got[i * 10 + 1] == AU.fingerprint_of_samples(s1)
        if i % 7 == 0:
            assert got[i * 10 + 2] == got[i * 10]  # 2× gain: identical


def test_perturbation_structural_hamming_bound():
    for i in range(0, 60, 5):
        f0 = AU.fingerprint_of_samples(
            np.array(AU._clip_samples(i, 0), np.int64)
        )
        f1 = AU.fingerprint_of_samples(
            np.array(AU._clip_samples(i, 1), np.int64)
        )
        assert bin(f0 ^ f1).count("1") <= AU.AUDIO_MAX_HAMMING


def test_gain_invariance_any_scale():
    """Loudness invariance is exact for ANY positive integer gain,
    not just the planted 2× — energies scale by g² on both sides of
    every comparison."""
    s = np.array(AU._clip_samples(11, 0), np.int64)
    base = AU.fingerprint_of_samples(s)
    for g in (2, 3, 7):
        assert AU.fingerprint_of_samples(s * g) == base


def test_unrelated_clips_far_apart():
    fps = [
        AU.fingerprint_of_samples(np.array(AU._clip_samples(i, 0), np.int64))
        for i in range(40)
    ]
    close = [
        (a, b)
        for a in range(40)
        for b in range(a + 1, 40)
        if bin(fps[a] ^ fps[b]).count("1") <= 2 * AU.AUDIO_MAX_HAMMING
    ]
    assert not close, f"unexpectedly correlated clips: {close[:5]}"


def test_fingerprint_rejects_short_clip():
    with pytest.raises(ValueError, match="empty fingerprint frames"):
        AU.fingerprint_of_samples(np.arange(40))


def test_keepers_prefer_fidelity_then_base(spark, sf_dir):
    """audio_dedup_keepers: one keeper per multi-clip group; the
    planted variants are length-identical to their base, so the
    min-aud_id tie-break keeps the base everywhere; the header
    arithmetic matches the real decoded sample count."""
    import io
    import wave

    rows = AU.audio_dedup_keepers(spark, sf_dir).collect()
    assert rows, "fixture must have dup groups"
    n_base = (
        spark.read.parquet(AU.stage_audio_corpus(spark, sf_dir))
        .where("variant = 0")
        .count()
    )
    expected_groups = sum(
        1 for i in range(n_base) if i % 5 == 0 or i % 7 == 0
    )
    assert len(rows) == expected_groups
    for r in rows:
        assert r.keeper_id % 10 == 0, f"group {r.group_id}: non-base keeper"
        i = r.keeper_id // 10
        assert r.keeper_samples == AU._clip_len(i)
        assert r.group_size == 2 + (1 if i % 35 == 0 else 0)
    # header arithmetic == real decode on a sample payload
    payload = (
        spark.read.parquet(AU.stage_audio_corpus(spark, sf_dir))
        .where("aud_id = 0")
        .collect()[0]
        .payload
    )
    with wave.open(io.BytesIO(bytes(payload))) as wf:
        assert len(bytes(payload)) - AU._WAV_HEADER_BYTES == 2 * wf.getnframes()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=64, max_value=400),
    st.integers(min_value=1, max_value=12),
)
def test_fingerprint_gain_invariance_property(seed, n, gain):
    """Loudness invariance over ARBITRARY clips, not just the planted
    formula: energies scale by gain² on both sides of every
    cross-multiplied comparison (int64-safe: |s| ≤ 2000·12, squared
    and summed ≪ 2⁶³)."""
    rng = np.random.default_rng(seed)
    s = rng.integers(-2000, 2001, size=n).astype(np.int64)
    assert AU.fingerprint_of_samples(s * gain) == AU.fingerprint_of_samples(s)


def test_incremental_composition_two_lines(spark, sf_dir):
    """The SURVEY claim that audio's incremental twin is a two-line
    composition, proven: batch = variants, index = bases, through
    hamming_blocked_pairs_between — every variant finds its base
    (gain copies at hamming 0), and no index×index pair appears."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators.dedup import (
        hamming_blocked_pairs_between,
    )

    fps = AU.audio_fingerprints(spark, sf_dir).localCheckpoint()
    matches = hamming_blocked_pairs_between(
        fps.where(F.col("aud_id") % 10 != 0),
        fps.where(F.col("aud_id") % 10 == 0),
        AU.AUDIO_BLOCK_CONFIGS[-1][1],
        AU.AUDIO_MAX_HAMMING,
        id_col="aud_id",
        hash_col="fp",
        out_cols=("new_id", "index_id", "hamming"),
    ).collect()
    got = {(r.new_id, r.index_id): r.hamming for r in matches}
    n = (
        spark.read.parquet(AU.stage_audio_corpus(spark, sf_dir))
        .where("variant = 0")
        .count()
    )
    for i in range(n):
        if i % 5 == 0:
            assert (i * 10 + 1, i * 10) in got
        if i % 7 == 0:
            assert got.get((i * 10 + 2, i * 10)) == 0
    assert all(new % 10 != 0 and idx % 10 == 0 for new, idx in got)
