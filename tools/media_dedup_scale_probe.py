"""10× scale probe for the r11 media near-dup dedup family
(image dHash / audio fingerprint / video frame-hash): stages
10×-sized corpora through the REAL synthesizers, then times the
exact shipped decode+hash+blocked-join pipelines at both sizes.

The fixture corpora cap at 400 base items, so the per-round sf
sweeps never exercise these joins past ~550 rows; this probe answers
the 100× question the way the sf1 text probe does — with decorrelated
bigger data through the same code path (`*_over` kernels +
`hamming_blocked_pairs` + the video rollup, widths from the shipped
adaptive config law).

Usage: python tools/media_dedup_scale_probe.py [--reps 2] [--scale 10]
Prints one JSON line {"image": {"small": s, "big": s, "ratio": r}, ...}.
Corpora are disk-memoized under spark-warehouse/media_dedup_scaleup.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_N = 400  # matches IMAGE_N / AUDIO_N (video fixture uses 300)
OUT_DIR = os.path.join(REPO, "spark-warehouse", "media_dedup_scaleup")


def _stage(spark, modality: str, n: int) -> str:
    """Stage an n-base-item corpus through the real synthesizers
    (same variant mix as the fixtures: %5 perturbed, %7 copies)."""
    path = os.path.join(OUT_DIR, f"{modality}_{n}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    rows = []
    if modality == "image":
        from robin_sparkles_spark.operators import image_dedup as I

        for i in range(n):
            rows.append(
                (i * 10, i, 0, "bmp", I._encode_bmp(I._image_pixels(i, 0)))
            )
            if i % 5 == 0:
                rows.append(
                    (i * 10 + 1, i, 1, "bmp", I._encode_bmp(I._image_pixels(i, 1)))
                )
            if i % 7 == 0:
                rows.append(
                    (i * 10 + 2, i, 2, "png", I._encode_png(I._image_pixels(i, 0), i))
                )
        schema = "img_id long, image_id long, variant int, fmt string, payload binary"
    elif modality == "audio":
        from robin_sparkles_spark.operators import audio_dedup as A

        for i in range(n):
            rows.append((i * 10, i, 0, A._encode_wav(A._clip_samples(i, 0))))
            if i % 5 == 0:
                rows.append((i * 10 + 1, i, 1, A._encode_wav(A._clip_samples(i, 1))))
            if i % 7 == 0:
                rows.append((i * 10 + 2, i, 2, A._encode_wav(A._clip_samples(i, 2))))
        schema = "aud_id long, audio_id long, variant int, payload binary"
    else:
        from robin_sparkles_spark.operators import video_dedup as V

        for i in range(n):
            rows.append((i * 10, i, 0, V._encode_tiff(V._clip_frames(i, 0))))
            if i % 5 == 0:
                rows.append((i * 10 + 1, i, 1, V._encode_tiff(V._clip_frames(i, 1))))
            if i % 7 == 0:
                rows.append((i * 10 + 2, i, 2, V._encode_tiff(V._clip_frames(i, 2))))
        schema = "vid_id long, video_id long, variant int, payload binary"
    spark.createDataFrame(rows, schema).repartition(8).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _pipeline_count(spark, modality: str, path: str) -> int:
    """The exact shipped pipeline over a staged corpus: decode+hash
    kernel → adaptive widths → blocked hamming join (→ video rollup)."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.functions.barrier import barrier
    from robin_sparkles_spark.operators.dedup import hamming_blocked_pairs

    media = spark.read.parquet(path)
    if modality == "image":
        from robin_sparkles_spark.operators import image_dedup as I

        n = media.count()
        hashes = barrier(
            I.image_dhash_over(media), "corpus", "image dhash table", eager=False
        )
        return hamming_blocked_pairs(
            hashes,
            I._image_block_widths(n),
            I.IMAGE_MAX_HAMMING,
            id_col="img_id",
            hash_col="dhash",
            out_cols=("img1", "img2", "hamming"),
        ).count()
    if modality == "audio":
        from robin_sparkles_spark.operators import audio_dedup as A

        n = media.count()
        fps = barrier(
            A.audio_fingerprints_over(media),
            "corpus",
            "audio fingerprint table",
            eager=False,
        )
        return hamming_blocked_pairs(
            fps,
            A._audio_block_widths(n),
            A.AUDIO_MAX_HAMMING,
            id_col="aud_id",
            hash_col="fp",
            out_cols=("aud1", "aud2", "hamming"),
        ).count()
    from robin_sparkles_spark.operators import video_dedup as V

    frames = barrier(
        V.video_frame_hashes_over(media),
        "corpus",
        "video frame-hash table",
        eager=False,
    )
    nf = frames.count()
    pairs = hamming_blocked_pairs(
        frames,
        V._video_block_widths(nf),
        V.FRAME_MAX_HAMMING,
        id_col="fid",
        hash_col="fhash",
        out_cols=("fid1", "fid2", "hamming"),
    )
    counts = frames.groupBy("vid_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return V._with_min_frames(
        V._clip_pairs_from_frame_pairs(pairs), counts
    ).count()


_ID_COLS = {"image": "img_id", "audio": "aud_id", "video": "vid_id"}


def _stage_pairs(spark, modality: str, path: str) -> str:
    """Memoize the pipeline's PAIR OUTPUT to parquet so the group
    stage times label propagation alone, decorrelated from the
    decode+hash+join wall already gated above."""
    out = path + "_pairs"
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    from pyspark.sql import functions as F

    from robin_sparkles_spark.functions.barrier import barrier
    from robin_sparkles_spark.operators.dedup import hamming_blocked_pairs

    media = spark.read.parquet(path)
    if modality == "image":
        from robin_sparkles_spark.operators import image_dedup as I

        pairs = hamming_blocked_pairs(
            barrier(I.image_dhash_over(media), "corpus", "probe image hashes", eager=False),
            I._image_block_widths(media.count()),
            I.IMAGE_MAX_HAMMING,
            id_col="img_id",
            hash_col="dhash",
            out_cols=("id1", "id2", "hamming"),
        )
    elif modality == "audio":
        from robin_sparkles_spark.operators import audio_dedup as A

        pairs = hamming_blocked_pairs(
            barrier(A.audio_fingerprints_over(media), "corpus", "probe audio fps", eager=False),
            A._audio_block_widths(media.count()),
            A.AUDIO_MAX_HAMMING,
            id_col="aud_id",
            hash_col="fp",
            out_cols=("id1", "id2", "hamming"),
        )
    else:
        from robin_sparkles_spark.operators import video_dedup as V

        frames = barrier(
            V.video_frame_hashes_over(media), "corpus", "probe video fhashes", eager=False
        )
        fp = hamming_blocked_pairs(
            frames,
            V._video_block_widths(frames.count()),
            V.FRAME_MAX_HAMMING,
            id_col="fid",
            hash_col="fhash",
            out_cols=("fid1", "fid2", "hamming"),
        )
        counts = frames.groupBy("vid_id").agg(F.count(F.lit(1)).alias("n_frames"))
        pairs = (
            V._with_min_frames(V._clip_pairs_from_frame_pairs(fp), counts)
            .select(F.col("vid1").alias("id1"), F.col("vid2").alias("id2"))
        )
    pairs.select("id1", "id2").write.mode("overwrite").parquet(out)
    return out


def _groups_count(spark, modality: str, path: str, pairs_path: str) -> int:
    """The GROUP-RESOLUTION stage the media keeper queries ride
    (SURVEY r12 candidate #4): memoized pairs → bidirectional edges →
    min-label propagation with pointer doubling → groups of size ≥ 2.
    Returns the group count (gated against the planted family count)."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.functions.barrier import barrier
    from robin_sparkles_spark.operators.dedup import propagate_min_labels

    id_col = _ID_COLS[modality]
    nodes = spark.read.parquet(path).select(
        F.col(id_col).alias("doc_id")
    ).distinct()
    pairs = spark.read.parquet(pairs_path)
    edges = barrier(
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst")).union(
            pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
        ),
        "corpus",
        "probe pair-graph edges",
    )
    labels = propagate_min_labels(nodes, edges)
    return (
        labels.groupBy("group_id")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") >= 2)
        .count()
    )


def run_groups(spark, reps: int = 2, scale: int = 10) -> dict:
    """Time the group-resolution stage at 1× and 10× corpora."""
    out = {}
    for modality in ("image", "audio", "video"):
        row = {}
        for label, n in (("small", BASE_N), ("big", BASE_N * scale)):
            path = _stage(spark, modality, n)
            pairs_path = _stage_pairs(spark, modality, path)
            best, groups = None, None
            for _ in range(reps):
                t0 = time.monotonic()
                groups = _groups_count(spark, modality, path, pairs_path)
                wall = time.monotonic() - t0
                best = wall if best is None else min(best, wall)
            row[label] = round(best, 3)
            row[f"{label}_groups"] = groups
        row["ratio"] = round(row["big"] / row["small"], 2)
        out[modality] = row
    return out


def run(spark, reps: int = 2, scale: int = 10) -> dict:
    out = {}
    for modality in ("image", "audio", "video"):
        small_path = _stage(spark, modality, BASE_N)
        big_path = _stage(spark, modality, BASE_N * scale)
        row = {}
        for label, path in (("small", small_path), ("big", big_path)):
            best = None
            for _ in range(reps):
                t0 = time.monotonic()
                rows = _pipeline_count(spark, modality, path)
                wall = time.monotonic() - t0
                best = wall if best is None else min(best, wall)
            row[label] = round(best, 3)
            row[f"{label}_pairs"] = rows
        row["ratio"] = round(row["big"] / row["small"], 2)
        out[modality] = row
    return out


def main() -> int:
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2
    scale = int(sys.argv[sys.argv.index("--scale") + 1]) if "--scale" in sys.argv else 10
    from robin_sparkles_spark.session import get_spark

    spark = get_spark(app_name="media_dedup_scale_probe")
    fn = run_groups if "--groups" in sys.argv else run
    print(json.dumps(fn(spark, reps=reps, scale=scale)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
