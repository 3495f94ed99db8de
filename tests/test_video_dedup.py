"""Video frame-level perceptual-hash near-dup dedup (r11):
blocked==bruteforce at every config, planted recall including the
trimmed-copy alignment case (the reason the operator is frame-level),
kernel/pure-Python hash agreement, and decorrelation."""

from __future__ import annotations

from pyspark.sql import functions as F

from robin_sparkles_spark.operators import video_dedup as VD
from robin_sparkles_spark.operators.image_dedup import dhash_of_gray


def _pairs(df):
    return {
        (r.vid1, r.vid2, r.matched_frames)
        for r in df.select("vid1", "vid2", "matched_frames").collect()
    }


def test_blocked_equals_bruteforce_every_config(spark, sf_dir):
    truth = _pairs(VD.dedup_video_phash_bruteforce(spark, sf_dir))
    assert truth, "fixture must contain planted near-dup clip pairs"
    from robin_sparkles_spark.operators.dedup import hamming_blocked_pairs

    frames = VD.video_frame_hashes(spark, sf_dir)
    counts = frames.groupBy("vid_id").agg(F.count("*").alias("n_frames"))
    for _ceiling, widths in VD.VIDEO_BLOCK_CONFIGS:
        frame_pairs = hamming_blocked_pairs(
            frames,
            widths,
            VD.FRAME_MAX_HAMMING,
            id_col="fid",
            hash_col="fhash",
            out_cols=("fid1", "fid2", "hamming"),
        )
        got = _pairs(
            VD._with_min_frames(
                VD._clip_pairs_from_frame_pairs(frame_pairs), counts
            )
        )
        assert got == truth, f"config {widths} diverged"


def test_planted_pairs_recovered(spark, sf_dir):
    """Recall 1.0 with the exact matched-frame counts: the per-frame
    perturbed variant matches its base on ALL n frames; the trimmed
    copy matches on its n−1 surviving frames (alignment invariance —
    a clip-level positional hash would score this 0)."""
    got = {
        (a, b): m for a, b, m in _pairs(VD.dedup_video_phash(spark, sf_dir))
    }
    n_base = (
        spark.read.parquet(VD.stage_video_dedup_corpus(spark, sf_dir))
        .where("variant = 0")
        .count()
    )
    for i in range(n_base):
        n, _w, _h = VD._clip_dims(i)
        if i % 5 == 0:
            assert got.get((i * 10, i * 10 + 1)) == n, f"perturbed {i}"
        if i % 7 == 0:
            assert got.get((i * 10, i * 10 + 2)) == n - 1, f"trimmed {i}"
        if i % 35 == 0:
            assert got.get((i * 10 + 1, i * 10 + 2)) == n - 1, (
                f"perturbed↔trimmed {i}"
            )


def test_frame_hash_kernel_exact(spark, sf_dir):
    """The Spark TIFF-walk kernel's hashes equal a driver-side
    recompute from the closed-form frames."""
    got = {
        (r.vid_id, r.frame_idx): r.fhash
        for r in VD.video_frame_hashes(spark, sf_dir).collect()
    }
    for i in range(0, 25):
        for variant in (0, 1, 2):
            if variant == 1 and i % 5:
                continue
            if variant == 2 and i % 7:
                continue
            for f, fr in enumerate(VD._clip_frames(i, variant)):
                assert got[(i * 10 + variant, f)] == dhash_of_gray(fr)


def test_perturbation_structural_hamming_bound():
    """≤ 3 changed pixels per frame, one grid cell each, ≤ 2
    comparisons per cell ⇒ per-frame hamming ≤ 6 by construction."""
    for i in range(0, 60, 5):
        base = VD._clip_frames(i, 0)
        pert = VD._clip_frames(i, 1)
        for fb, fp in zip(base, pert):
            d = dhash_of_gray(fb) ^ dhash_of_gray(fp)
            assert bin(d).count("1") <= VD.FRAME_MAX_HAMMING


def test_trim_alignment_exact():
    for i in (0, 7, 14, 35):
        base = [dhash_of_gray(f) for f in VD._clip_frames(i, 0)]
        trim = [dhash_of_gray(f) for f in VD._clip_frames(i, 2)]
        assert trim == base[1:]


def test_unrelated_frames_far_apart():
    hashes = []
    for vid in range(40):
        hashes += [(vid, dhash_of_gray(f)) for f in VD._clip_frames(vid, 0)]
    close = [
        (a, b)
        for a in range(len(hashes))
        for b in range(a + 1, len(hashes))
        if hashes[a][0] != hashes[b][0]
        and bin(hashes[a][1] ^ hashes[b][1]).count("1")
        <= VD.FRAME_MAX_HAMMING
    ]
    assert not close, f"correlated cross-clip frames: {close[:5]}"


def test_fid_encoding_rejects_overflow(spark, sf_dir):
    assert VD.FID_STRIDE == 32
    for i in (0, 8, 17):
        n, _w, _h = VD._clip_dims(i)
        assert n < VD.FID_STRIDE


def test_keepers_prefer_untrimmed_original(spark, sf_dir):
    """video_dedup_keepers: the fidelity policy (most frames, then
    min vid_id) keeps the untrimmed BASE in every planted group —
    the trimmed reupload always loses on frame count, the per-frame
    perturbed variant on the tie-break."""
    rows = VD.dedup_video_phash(spark, sf_dir)  # warm staging
    keepers = VD.video_dedup_keepers(spark, sf_dir).collect()
    assert keepers, "fixture must have dup groups"
    n_base = (
        spark.read.parquet(VD.stage_video_dedup_corpus(spark, sf_dir))
        .where("variant = 0")
        .count()
    )
    expected_groups = sum(
        1 for i in range(n_base) if i % 5 == 0 or i % 7 == 0
    )
    assert len(keepers) == expected_groups
    for r in keepers:
        assert r.keeper_id % 10 == 0, f"group {r.group_id}: non-base keeper"
        i = r.keeper_id // 10
        n, _w, _h = VD._clip_dims(i)
        assert r.keeper_frames == n
        assert r.group_size == 1 + (1 if i % 5 == 0 else 0) + (
            1 if i % 7 == 0 else 0
        )


def test_strided_sampling_trades_trim_recall(spark, sf_dir):
    """Stride 2 keeps every perturbed pair (same container positions)
    and loses every trimmed pair (offset −1 → disjoint sampled
    content) — the fps-budget trade-off, asserted in data."""
    got = {
        (a, b) for a, b, _m in _pairs(VD.dedup_video_phash_strided(spark, sf_dir))
    }
    n_base = (
        spark.read.parquet(VD.stage_video_dedup_corpus(spark, sf_dir))
        .where("variant = 0")
        .count()
    )
    for i in range(n_base):
        if i % 5 == 0:
            assert (i * 10, i * 10 + 1) in got, f"perturbed {i} lost"
        if i % 7 == 0:
            assert (i * 10, i * 10 + 2) not in got, (
                f"trimmed {i} should be invisible at stride 2"
            )
    assert len(got) == sum(1 for i in range(n_base) if i % 5 == 0)
