"""Video near-duplicate dedup via FRAME-level perceptual hashing
(r11): per-frame 63-bit dHash over REAL decoded multi-page-TIFF
frames, hamming-blocked at frame granularity, then aggregated to clip
pairs — the fourth modality the dedup stack covers (text → images →
audio → video).

Why frame-level and not one hash per clip: the load-bearing property
of video dedup is ALIGNMENT-INVARIANCE. A trimmed copy (the planted
variant 2 drops the first frame — the YouTube-reupload shape) shares
every remaining frame with its source but at a shifted index, so any
single clip-level fingerprint that mixes frames positionally misses
it, while frame-level matching recovers n−1 hamming-0 frame pairs.
The fixture demonstrates this (it is the reason variant 2 exists),
the pytest asserts it.

- **Decode**: the real IFD-chain walk over multi-page grayscale TIFF
  — the spec'd multi-frame mechanism ``video_decode.sample_frames``
  already parses (same tags, same strip reads); frames hash through
  :func:`image_dedup.dhash_of_gray` (the comparisons are
  scale-invariant, so raw 8-bit gray and milli-weighted RGB share one
  kernel).
- **Matching**: frame hashes enter the shared pigeonhole-blocked
  hamming join (:func:`dedup.hamming_blocked_pairs`) keyed by
  ``fid = clip_row · 32 + frame_idx`` (≤ 16 frames per fixture clip);
  cross-clip frame pairs at hamming ≤ 6 aggregate per clip pair, and
  a pair is a near-dup when ≥ half the shorter clip's frames matched
  (``2·matched ≥ min(n1, n2)``) — the threshold is what suppresses
  single random frame collisions between unrelated clips.

100 TB posture: decode+hash is a map-only Arrow projection emitting
8 B per SAMPLED frame (production sets a frame stride / fps budget —
the declared fixture hashes every frame so the planted structural
bounds stay exact; pixel data never shuffles). The pair search is the
measured simhash-family blocked join at frame cardinality, and the
clip rollup is one groupBy on candidate pairs (output-sized). Frame
counts come from the decoded table itself (broadcast-joined
clip-count aggregate), not from fixture arithmetic.

Planted fixture (closed-form): base clip per video_id with
n = 8 + id % 9 frames of w = 12 + id % 18, h = 9 + id % 10 (every 9×8
dHash cell non-empty); gray(cf, x, y) = (a·(x+7y+1) + b·(x·y+1)) % 256
with a = (97·id + 31·cf + 7·id·cf + 3) % 251 and
b = (53·id + 17·cf + 11·id·cf + 11) % 241 — prime-decoupled
coefficients with an id·cf cross term (see ``_frame_gray`` for the
aliasing the 10× probe forced out), decorrelating unrelated frames
(pytest-asserted, probe-verified: planted count == output at 10×).
Variants:
id % 5 == 0 → every frame gets 3 deterministic pixel overrides (each
touches one grid cell ⇒ ≤ 2 comparisons ⇒ frame hamming ≤ 6
STRUCTURALLY = the threshold); id % 7 == 0 → the first frame is
dropped (content frame cf = container frame f + 1) — an exact trim
whose surviving frames hash identically to the base's.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.barrier import barrier
from ..sources import load_table
from ..sources.staging import is_staged, stage_width, staged_path
from .dedup import hamming_blocked_pairs
from .image_dedup import DHASH_BITS, dhash_of_gray
from .video_decode import (
    _TAG_BITS,
    _TAG_COMPRESSION,
    _TAG_LENGTH,
    _TAG_PHOTOMETRIC,
    _TAG_ROWS_PER_STRIP,
    _TAG_SPP,
    _TAG_STRIP_BYTES,
    _TAG_STRIP_OFFSETS,
    _TAG_WIDTH,
    _ifd_entry,
)

VIDEO_DEDUP_N = 300  # base clips (min'd with the doc count)
FRAME_MAX_HAMMING = 6
FID_STRIDE = 32  # fid = clip_row * 32 + frame_idx; fixture frames ≤ 16

# Same adaptive pigeonhole law as image/audio/simhash (key_bits ∝
# log2 of the BLOCKED table's row count — here that is FRAMES, not
# clips). Every config yields the identical exact output.
VIDEO_BLOCK_CONFIGS: tuple[tuple[int | None, tuple[int, ...]], ...] = (
    (100_000, (8, 8, 8, 8, 8, 8, 8, 7)),
    (None, (7, 7, 7, 7, 7, 7, 7, 7, 7)),
)
assert all(sum(w) == DHASH_BITS for _, w in VIDEO_BLOCK_CONFIGS)


def _video_block_widths(n_frames: int) -> tuple[int, ...]:
    for ceiling, widths in VIDEO_BLOCK_CONFIGS:
        if ceiling is None or n_frames <= ceiling:
            return widths
    raise AssertionError("unreachable: last config has no ceiling")


# --- closed-form corpus -----------------------------------------------------


def _clip_dims(video_id: int) -> tuple[int, int, int]:
    """(n_frames, w, h) of the BASE clip."""
    return 8 + video_id % 9, 12 + video_id % 18, 9 + video_id % 10


def _frame_gray(video_id: int, cf: int, w: int, h: int) -> np.ndarray:
    """Base gray frame for CONTENT frame index ``cf``.

    The two mixing coefficients reduce through DISTINCT PRIME moduli
    (251/241) and carry an id·cf CROSS term: the first r11 form used
    one seed linear in (id, cf) mod 256, which aliases with period
    256 — the 10× probe surfaced ~4700 alias clip pairs at 4000
    clips; a linear prime-moduli form still admitted temporal-shift
    aliases (the collision equations are linear, so one lucky Δid
    satisfied them at EVERY frame simultaneously — exactly the
    planted-trim shape). The cross term makes Δa depend on cf itself,
    so a coefficient collision at one frame cannot persist to the
    next, and a clip-level alias (≥ half the frames) needs ~(1/6e4)^k
    independent per-frame collisions — probe-verified: planted count
    == output at 10×."""
    a = (97 * video_id + 31 * cf + 7 * video_id * cf + 3) % 251
    b = (53 * video_id + 17 * cf + 11 * video_id * cf + 11) % 241
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return (a * (x + 7 * y + 1) + b * (x * y + 1)) % 256


def _perturb_positions(video_id: int, f: int, w: int, h: int):
    """3 deterministic pixel overrides per frame of the near-dup
    variant, in application order (later entries win on collision;
    the oracle checks p descending for the same last-wins rule)."""
    return [
        (
            (video_id + 5 * p + f) % w,
            (2 * video_id + 3 * p + f) % h,
            (37 * video_id + 91 * p + 11 * f) % 256,
        )
        for p in range(3)
    ]


def _clip_frames(video_id: int, variant: int) -> list[np.ndarray]:
    n, w, h = _clip_dims(video_id)
    if variant == 2:  # trimmed: drop frame 0, keep content frames 1..n-1
        return [_frame_gray(video_id, cf, w, h) for cf in range(1, n)]
    frames = [_frame_gray(video_id, cf, w, h) for cf in range(n)]
    if variant == 1:
        for f, fr in enumerate(frames):
            for xp, yp, v in _perturb_positions(video_id, f, w, h):
                fr[yp, xp] = v
    return frames


def _encode_tiff(frames: list[np.ndarray]) -> bytes:
    """Spec-valid II multi-page TIFF (one single-strip uncompressed
    8-bit grayscale IFD per frame, chained through next-IFD pointers)
    — the exact container layout ``video_decode.synth_tiff`` writes
    and its frame walk parses."""
    strips = [fr.astype(np.uint8).tobytes() for fr in frames]
    strip_offsets = []
    pos = 8
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    ifd_start = pos
    n_entries = 9
    ifd_size = 2 + n_entries * 12 + 4
    out = [struct.pack("<2sHI", b"II", 42, ifd_start)]
    out += strips
    for f, fr in enumerate(frames):
        h, w = fr.shape
        entries = b"".join(
            (
                _ifd_entry(_TAG_WIDTH, 3, 1, w),
                _ifd_entry(_TAG_LENGTH, 3, 1, h),
                _ifd_entry(_TAG_BITS, 3, 1, 8),
                _ifd_entry(_TAG_COMPRESSION, 3, 1, 1),
                _ifd_entry(_TAG_PHOTOMETRIC, 3, 1, 1),
                _ifd_entry(_TAG_STRIP_OFFSETS, 4, 1, strip_offsets[f]),
                _ifd_entry(_TAG_SPP, 3, 1, 1),
                _ifd_entry(_TAG_ROWS_PER_STRIP, 3, 1, h),
                _ifd_entry(_TAG_STRIP_BYTES, 4, 1, w * h),
            )
        )
        next_ifd = 0 if f == len(frames) - 1 else ifd_start + (f + 1) * ifd_size
        out.append(
            struct.pack("<H", n_entries) + entries + struct.pack("<I", next_ifd)
        )
    return b"".join(out)


def video_dedup_corpus_path(sf_dir: str) -> str:
    # v2: prime-decoupled mixing coefficients (the staging key
    # fingerprints the SOURCE parquet, not the synthesis formula)
    return staged_path(sf_dir, "video_neardup_corpus_v2", "documents")


def stage_video_dedup_corpus(spark: SparkSession, sf_dir: str) -> str:
    """(vid_id, video_id, variant, payload): variant 0 = base (every
    id), 1 = per-frame 3-pixel perturbed (id % 5 == 0), 2 = trimmed
    copy dropping frame 0 (id % 7 == 0). ``vid_id = video_id*10 +
    variant``."""
    path = video_dedup_corpus_path(sf_dir)
    if is_staged(path):
        return path
    n_docs = load_table(spark, sf_dir, "documents").count()
    n = min(VIDEO_DEDUP_N, n_docs)
    rows = []
    for i in range(n):
        rows.append((i * 10, i, 0, _encode_tiff(_clip_frames(i, 0))))
        if i % 5 == 0:
            rows.append((i * 10 + 1, i, 1, _encode_tiff(_clip_frames(i, 1))))
        if i % 7 == 0:
            rows.append((i * 10 + 2, i, 2, _encode_tiff(_clip_frames(i, 2))))
    spark.createDataFrame(
        rows, "vid_id long, video_id long, variant int, payload binary"
    ).repartition(stage_width(len(rows))).write.mode("overwrite").parquet(path)
    return path


# --- frame-hash kernel ------------------------------------------------------


def video_frame_hashes(
    spark: SparkSession, sf_dir: str, stride: int = 1
) -> DataFrame:
    """(fid, vid_id, frame_idx, fhash) over the staged corpus: real
    IFD-chain walk + per-frame dHash, one cardinality-changing
    Arrow-batched projection (clip row → one row per sampled frame).
    Production sets ``stride`` to its fps budget; the declared query
    hashes every frame so the fixture's structural bounds stay exact.
    """
    return video_frame_hashes_over(
        spark.read.parquet(stage_video_dedup_corpus(spark, sf_dir)),
        stride=stride,
    )


def video_frame_hashes_over(media: DataFrame, stride: int = 1) -> DataFrame:
    """The IFD-walk + per-frame-dHash kernel over any (vid_id,
    payload) frame — split out so the 10× scale probe drives the
    exact shipped path."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for vid_id, payload in zip(pdf["vid_id"], pdf["payload"]):
                blob = bytes(payload)
                order, magic, ifd_off = struct.unpack_from("<2sHI", blob, 0)
                if order != b"II" or magic != 42:
                    raise ValueError(f"vid_id {vid_id}: not a II TIFF")
                frame = 0
                while ifd_off:
                    (n_entries,) = struct.unpack_from("<H", blob, ifd_off)
                    tags = {}
                    for i in range(n_entries):
                        tag, _typ, _cnt, val = struct.unpack_from(
                            "<HHII", blob, ifd_off + 2 + i * 12
                        )
                        tags[tag] = val
                    (ifd_off,) = struct.unpack_from(
                        "<I", blob, ifd_off + 2 + n_entries * 12
                    )
                    if frame % stride:
                        frame += 1
                        continue
                    if tags.get(_TAG_COMPRESSION, 1) != 1:
                        raise ValueError(f"vid_id {vid_id}: compressed TIFF")
                    w, h = tags[_TAG_WIDTH], tags[_TAG_LENGTH]
                    off = tags[_TAG_STRIP_OFFSETS]
                    gray = np.frombuffer(
                        blob, np.uint8, count=w * h, offset=off
                    ).reshape(h, w)
                    if frame >= FID_STRIDE:
                        raise ValueError(
                            f"vid_id {vid_id}: frame {frame} overflows "
                            f"the fid encoding (< {FID_STRIDE})"
                        )
                    recs.append(
                        (
                            int(vid_id) * FID_STRIDE + frame,
                            int(vid_id),
                            frame,
                            dhash_of_gray(gray),
                        )
                    )
                    frame += 1
            yield pd.DataFrame(
                recs, columns=["fid", "vid_id", "frame_idx", "fhash"]
            )

    return media.select("vid_id", "payload").mapInPandas(
        kernel, schema="fid long, vid_id long, frame_idx int, fhash long"
    )


# --- declared query ---------------------------------------------------------


def _clip_pairs_from_frame_pairs(frame_pairs: DataFrame) -> DataFrame:
    """Aggregate frame-level hamming matches to clip pairs and keep
    pairs where ≥ half the shorter clip's frames matched. Frame
    counts come from the frame table itself (tiny clip-count
    aggregate, broadcast twice)."""
    pairs = frame_pairs.select(
        (F.col("fid1") / FID_STRIDE).cast("long").alias("vid1"),
        (F.col("fid2") / FID_STRIDE).cast("long").alias("vid2"),
    ).where(F.col("vid1") != F.col("vid2"))
    # fid = vid*32 + frame and fid1 < fid2 together imply vid1 ≤ vid2,
    # so after the inequality filter each unordered clip pair groups
    # under (vid1 < vid2) with one row per matching frame pair.
    matched = pairs.groupBy("vid1", "vid2").agg(
        F.count(F.lit(1)).alias("matched_frames")
    )
    return matched


def _with_min_frames(matched: DataFrame, counts: DataFrame) -> DataFrame:
    c1 = counts.select(
        F.col("vid_id").alias("vid1"), F.col("n_frames").alias("n1")
    )
    c2 = counts.select(
        F.col("vid_id").alias("vid2"), F.col("n_frames").alias("n2")
    )
    return (
        matched.join(F.broadcast(c1), "vid1")
        .join(F.broadcast(c2), "vid2")
        .where(
            F.col("matched_frames") * 2 >= F.least(F.col("n1"), F.col("n2"))
        )
        .select("vid1", "vid2", "matched_frames")
    )


def _clip_pairs_over(frames: DataFrame) -> DataFrame:
    """Blocked frame-pair join → clip-pair rollup → min-frames rule,
    over an already-materialized frame-hash table — split out (r15,
    guide §2.4) so the keeper query reuses ONE frame barrier instead
    of decoding the corpus a second time through its own
    dedup_video_phash call. Blocking layout adapts to the FRAME count
    (same precedent as simhash/image/audio)."""
    n_frames_total = frames.count()
    frame_pairs = hamming_blocked_pairs(
        frames,
        _video_block_widths(n_frames_total),
        FRAME_MAX_HAMMING,
        id_col="fid",
        hash_col="fhash",
        out_cols=("fid1", "fid2", "hamming"),
    )
    counts = frames.groupBy("vid_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    return _with_min_frames(_clip_pairs_from_frame_pairs(frame_pairs), counts)


def dedup_video_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup video clip pairs: frame dHash matches at hamming ≤ 6
    covering ≥ half the shorter clip."""
    frames = barrier(
        video_frame_hashes(spark, sf_dir),
        "corpus",
        "video frame-hash table",
        eager=False,
    )
    return _clip_pairs_over(frames)


def dedup_video_phash_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """All-frame-pairs hamming scan — pytest-only ground truth for the
    blocked form; never declared."""
    frames = video_frame_hashes(spark, sf_dir)
    a, b = frames.alias("a"), frames.alias("b")
    hamming = F.bit_count(
        F.col("a.fhash").bitwiseXOR(F.col("b.fhash"))
    ).cast("long")
    frame_pairs = (
        a.join(F.broadcast(b), F.col("a.fid") < F.col("b.fid"))
        .select(
            F.col("a.fid").alias("fid1"),
            F.col("b.fid").alias("fid2"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= FRAME_MAX_HAMMING)
    )
    counts = frames.groupBy("vid_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    return _with_min_frames(_clip_pairs_from_frame_pairs(frame_pairs), counts)


def video_oracle_ctes(sf_dir: str) -> str:
    """The closed-form frame-hash + clip-pair pipeline as a reusable
    CTE body ending in ``counts(vid_id, nf)`` and ``matched(vid1,
    vid2, matched_frames)`` (+ ``dims``) — shared by the pair oracle
    below and the r11 keeper oracle."""
    from ..session import active_or_local

    path = stage_video_dedup_corpus(
        active_or_local("video_phash_oracle"), sf_dir
    )
    over = "(37*d.video_id + {c} + 11*f.range) % 256"
    pos = (
        "d.variant = 1 AND x.range = (d.video_id + {a} + f.range) % d.w "
        "AND y.range = (2*d.video_id + {b} + f.range) % d.h"
    )
    cf = "(f.range + CASE WHEN d.variant = 2 THEN 1 ELSE 0 END)"
    seed_a = f"((97*d.video_id + 31*{cf} + 7*d.video_id*{cf} + 3) % 251)"
    seed_b = f"((53*d.video_id + 17*{cf} + 11*d.video_id*{cf} + 11) % 241)"
    return f"""dims AS (
  SELECT vid_id, video_id, variant,
         12 + video_id % 18 AS w, 9 + video_id % 10 AS h,
         8 + video_id % 9
           - CASE WHEN variant = 2 THEN 1 ELSE 0 END AS nf
  FROM read_parquet('{path}/*.parquet')
),
px AS (
  SELECT d.vid_id, f.range AS f, x.range AS x, y.range AS y, d.w, d.h,
    CASE
      WHEN {pos.format(a=10, b=6)} THEN {over.format(c=182)}
      WHEN {pos.format(a=5, b=3)} THEN {over.format(c=91)}
      WHEN {pos.format(a=0, b=0)} THEN {over.format(c=0)}
      ELSE ({seed_a} * (x.range + 7*y.range + 1)
            + {seed_b} * (x.range*y.range + 1)) % 256
    END AS gray
  FROM dims d, range(16) f, range(30) x, range(19) y
  WHERE f.range < d.nf AND x.range < d.w AND y.range < d.h
),
cells AS (
  SELECT vid_id, f, (x*9)//w AS cx, (y*8)//h AS cy,
         SUM(gray) AS s, COUNT(*) AS n
  FROM px GROUP BY 1, 2, 3, 4
),
bits AS (
  SELECT c0.vid_id, c0.f, c0.cy*8 + c0.cx AS b,
         CASE WHEN c1.s * c0.n > c0.s * c1.n THEN 1 ELSE 0 END AS bit
  FROM cells c0 JOIN cells c1
    ON c1.vid_id = c0.vid_id AND c1.f = c0.f
   AND c1.cy = c0.cy AND c1.cx = c0.cx + 1
  WHERE c0.cx < 8 AND c0.cy*8 + c0.cx < {DHASH_BITS}
),
fhashes AS (
  SELECT vid_id, f,
         SUM(CASE WHEN bit = 1 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS fh
  FROM bits GROUP BY 1, 2
),
counts AS (SELECT vid_id, COUNT(*) AS nf FROM fhashes GROUP BY 1),
matched AS (
  SELECT a.vid_id AS vid1, b.vid_id AS vid2, COUNT(*) AS matched_frames
  FROM fhashes a JOIN fhashes b ON a.vid_id < b.vid_id
  WHERE bit_count(xor(a.fh, b.fh)) <= {FRAME_MAX_HAMMING}
  GROUP BY 1, 2
)"""


def video_phash_oracle(sf_dir: str) -> str:
    """Closed-form DuckDB twin: regenerate every container frame's
    pixels (variant 2 reads content frame f+1 — the trim; variant 1's
    overrides checked p-descending = last-wins), build the per-frame
    63-bit dHash over the exact 9×8 cell partition, brute-force
    cross-clip frame pairs at hamming ≤ 6, and apply the same
    half-the-shorter-clip rollup."""
    return f"""
WITH {video_oracle_ctes(sf_dir)}
SELECT m.vid1, m.vid2, m.matched_frames
FROM matched m
JOIN counts c1 ON c1.vid_id = m.vid1
JOIN counts c2 ON c2.vid_id = m.vid2
WHERE 2 * m.matched_frames >= LEAST(c1.nf, c2.nf)
"""


# --- groups → keepers (r11, executing the written r12 candidate #2) ----------


def video_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve near-dup clip pairs into groups (the shared min-label
    components) and keep the HIGHEST-FIDELITY member of each multi-
    clip group: most frames first — the untrimmed original beats its
    trimmed reupload, which is exactly the planted variant-2 shape —
    then min vid_id. One row per group of size ≥ 2: (group_id,
    keeper_id, group_size, keeper_frames, n_dropped). Same plan
    contract as ``curation.dedup_canonical_keepers`` (components over
    the blocked-join pair graph, bounded per-group keeper window)."""
    from .dedup import propagate_min_labels

    frames = barrier(
        video_frame_hashes(spark, sf_dir),
        "corpus",
        "video frame-hash table",
        eager=False,
    )
    counts = frames.groupBy("vid_id").agg(F.count(F.lit(1)).alias("nf"))
    # r15: the pair graph reuses THIS frame barrier — the former
    # dedup_video_phash call built its own, so the decode kernel ran
    # over the whole corpus twice per keeper query (guide §2.4).
    pairs = _clip_pairs_over(frames).select("vid1", "vid2")
    edges = barrier(
        pairs.select(F.col("vid1").alias("src"), F.col("vid2").alias("dst"))
        .union(
            pairs.select(F.col("vid2").alias("src"), F.col("vid1").alias("dst"))
        ),
        "corpus",
        "video pair-graph edges",
    )
    labels = propagate_min_labels(
        counts.select(F.col("vid_id").alias("doc_id")), edges
    ).select(F.col("doc_id").alias("vid_id"), "group_id")
    sizes = labels.groupBy("group_id").agg(F.count("*").alias("group_size"))
    from pyspark.sql import Window as W

    w = W.partitionBy("group_id").orderBy(F.desc("nf"), F.asc("vid_id"))
    return (
        # corpus × corpus joins: pin SHUFFLE_HASH (r10 audit)
        labels.join(counts.hint("shuffle_hash"), "vid_id")
        .join(sizes.hint("shuffle_hash"), "group_id")
        .where(F.col("group_size") >= 2)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "group_id",
            F.col("vid_id").alias("keeper_id"),
            "group_size",
            F.col("nf").cast("long").alias("keeper_frames"),
            (F.col("group_size") - 1).cast("long").alias("n_dropped"),
        )
    )


def video_keepers_oracle(sf_dir: str) -> str:
    """Recursive-closure twin over the shared frame-hash pipeline:
    same pair semantics, min-reachable labels, fidelity keeper."""
    return f"""
WITH RECURSIVE {video_oracle_ctes(sf_dir)},
vpairs AS (
  SELECT m.vid1, m.vid2
  FROM matched m
  JOIN counts c1 ON c1.vid_id = m.vid1
  JOIN counts c2 ON c2.vid_id = m.vid2
  WHERE 2 * m.matched_frames >= LEAST(c1.nf, c2.nf)
),
edges AS (
  SELECT vid1 AS src, vid2 AS dst FROM vpairs
  UNION ALL
  SELECT vid2 AS src, vid1 AS dst FROM vpairs
),
reach(vid_id, r) AS (
  SELECT vid_id, vid_id FROM dims
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.vid_id
),
labels AS (SELECT vid_id, MIN(r) AS group_id FROM reach GROUP BY vid_id),
sizes AS (SELECT group_id, COUNT(*) AS group_size FROM labels GROUP BY group_id),
ranked AS (
  SELECT l.group_id, l.vid_id, s.group_size, c.nf,
         ROW_NUMBER() OVER (PARTITION BY l.group_id
                            ORDER BY c.nf DESC, l.vid_id ASC) AS rk
  FROM labels l
  JOIN sizes s USING (group_id)
  JOIN counts c USING (vid_id)
  WHERE s.group_size >= 2
)
SELECT group_id, vid_id AS keeper_id, group_size,
       CAST(nf AS BIGINT) AS keeper_frames,
       CAST(group_size - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rk = 1
"""


# --- strided sampling variant (r11, executing the written r12
# candidate #5): the fps-budget trade-off, measured not claimed ------------

VIDEO_STRIDE = 2


def dedup_video_phash_strided(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedup_video_phash` under a stride-2 frame budget (hash every
    2nd container frame — the production fps-sampling dial). The
    trade-off is structural and this query DOCUMENTS it in data: the
    per-frame perturbed copies still match (perturbations ride the
    same container positions), but the trimmed reupload becomes
    INVISIBLE — its content sits at container offset −1, so stride-2
    sampling sees disjoint content frames (odd vs even) and zero
    matches. Production picks stride by how much of the
    trim/temporal-shift recall it is willing to sell for a 1/stride
    decode+index budget; stride 1 (the declared default above) keeps
    it all."""
    frames = barrier(
        video_frame_hashes(spark, sf_dir, stride=VIDEO_STRIDE),
        "corpus",
        "video frame-hash table",
        eager=False,
    )
    n_frames_total = frames.count()
    frame_pairs = hamming_blocked_pairs(
        frames,
        _video_block_widths(n_frames_total),
        FRAME_MAX_HAMMING,
        id_col="fid",
        hash_col="fhash",
        out_cols=("fid1", "fid2", "hamming"),
    )
    counts = frames.groupBy("vid_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return _with_min_frames(_clip_pairs_from_frame_pairs(frame_pairs), counts)


def video_strided_oracle(sf_dir: str) -> str:
    """The pair oracle with container positions filtered to the
    stride (content indices shift first for the trimmed variant, so
    the filter applies to f — the CONTAINER index — exactly like the
    kernel's ``frame % stride`` gate)."""
    ctes = video_oracle_ctes(sf_dir).replace(
        "WHERE f.range < d.nf",
        f"WHERE f.range < d.nf AND f.range % {VIDEO_STRIDE} = 0",
    )
    return f"""
WITH {ctes}
SELECT m.vid1, m.vid2, m.matched_frames
FROM matched m
JOIN counts c1 ON c1.vid_id = m.vid1
JOIN counts c2 ON c2.vid_id = m.vid2
WHERE 2 * m.matched_frames >= LEAST(c1.nf, c2.nf)
"""


QUERIES = {
    "dedup_video_phash": (dedup_video_phash, video_phash_oracle),
    "video_dedup_keepers": (video_dedup_keepers, video_keepers_oracle),
    "dedup_video_phash_strided": (
        dedup_video_phash_strided,
        video_strided_oracle,
    ),
}


# --- incremental ingest (late r11: modality matrix) ---------------------------
#
# Same fixture split arithmetic as image/audio (oracle-mirrored). The
# verdict rides FRAME-level matching: a new clip is a dup of an index
# clip when their matched-frame count passes the same
# half-the-shorter-clip rule as the pair query — so trimmed re-uploads
# of indexed content are caught (a clip-level hash cannot).
#
# NO pure-streaming twin, deliberately: the verdict needs TWO chained
# aggregations (frame pairs -> per-clip-pair matched count -> per-new-
# clip argmax), and Structured Streaming supports a single aggregation
# per query — the streaming form of this operator is the foreachBatch
# maintenance shape (media_ingest.apply_ingest_batch generalizes; the
# image/audio single-agg verdicts stream directly). Recorded as a
# boundary, not a gap.


def _vid_in_index() -> F.Column:
    fam = (F.col("vid_id") / 10).cast("long")
    return (F.col("vid_id") % 10 == 0) & (fam % 4 != 3)


def dedup_video_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup status of every NEW-batch clip vs the index:
    (vid_id, dup_of, matched_frames, is_dup). Best match = max
    matched frames (ties -> min index vid); matched_frames is 0 for
    non-dups (integer sentinels)."""
    from pyspark.sql import Window as W

    from .dedup import hamming_blocked_pairs_between

    frames = barrier(
        video_frame_hashes(spark, sf_dir),
        "corpus",
        "video frame-hash table",
        eager=False,
    )
    n_frames_total = frames.count()
    widths = _video_block_widths(n_frames_total)
    fp = hamming_blocked_pairs_between(
        frames.where(~_vid_in_index()),
        frames.where(_vid_in_index()),
        widths,
        FRAME_MAX_HAMMING,
        id_col="fid",
        hash_col="fhash",
        out_cols=("fid1", "fid2", "hamming"),
    )
    matched = (
        fp.select(
            (F.col("fid1") / FID_STRIDE).cast("long").alias("new_vid"),
            (F.col("fid2") / FID_STRIDE).cast("long").alias("index_vid"),
        )
        .groupBy("new_vid", "index_vid")
        .agg(F.count(F.lit(1)).alias("matched_frames"))
    )
    counts = frames.groupBy("vid_id").agg(F.count(F.lit(1)).alias("n_frames"))
    c1 = counts.select(F.col("vid_id").alias("new_vid"), F.col("n_frames").alias("n1"))
    c2 = counts.select(F.col("vid_id").alias("index_vid"), F.col("n_frames").alias("n2"))
    qual = (
        matched.join(F.broadcast(c1), "new_vid")
        .join(F.broadcast(c2), "index_vid")
        .where(F.col("matched_frames") * 2 >= F.least(F.col("n1"), F.col("n2")))
    )
    w = W.partitionBy("new_vid").orderBy(
        F.desc("matched_frames"), F.asc("index_vid")
    )
    best = (
        qual.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("new_vid", "index_vid", "matched_frames")
    )
    batch = counts.where(~_vid_in_index()).select("vid_id")
    return batch.join(best, batch.vid_id == best.new_vid, "left").select(
        "vid_id",
        F.coalesce(F.col("index_vid"), F.lit(-1)).cast("long").alias("dup_of"),
        F.coalesce(F.col("matched_frames"), F.lit(0)).cast("long").alias(
            "matched_frames"
        ),
        F.col("index_vid").isNotNull().alias("is_dup"),
    )


def video_incremental_oracle(sf_dir: str) -> str:
    """Shared frame-hash pipeline -> arithmetic split -> brute-force
    new x index frame matches -> rollup -> best match -> left join."""
    in_idx = "({v} % 10 = 0 AND ({v} // 10) % 4 <> 3)"
    return f"""
WITH {video_oracle_ctes(sf_dir)},
fmatch AS (
  SELECT n.vid_id AS new_vid, i.vid_id AS index_vid,
         COUNT(*) AS matched_frames
  FROM fhashes n JOIN fhashes i
    ON NOT {in_idx.format(v='n.vid_id')}
   AND {in_idx.format(v='i.vid_id')}
   AND bit_count(xor(n.fh, i.fh)) <= {FRAME_MAX_HAMMING}
  GROUP BY 1, 2
),
qual AS (
  SELECT f.new_vid, f.index_vid, f.matched_frames
  FROM fmatch f
  JOIN counts c1 ON c1.vid_id = f.new_vid
  JOIN counts c2 ON c2.vid_id = f.index_vid
  WHERE 2 * f.matched_frames >= LEAST(c1.nf, c2.nf)
),
best AS (
  SELECT new_vid, index_vid, matched_frames,
         ROW_NUMBER() OVER (PARTITION BY new_vid
                            ORDER BY matched_frames DESC, index_vid ASC) AS rn
  FROM qual
)
SELECT c.vid_id,
       COALESCE(b.index_vid, -1) AS dup_of,
       CAST(COALESCE(b.matched_frames, 0) AS BIGINT) AS matched_frames,
       b.index_vid IS NOT NULL AS is_dup
FROM counts c
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.new_vid = c.vid_id
WHERE NOT {in_idx.format(v='c.vid_id')}
"""


QUERIES_TAIL = {
    "dedup_video_incremental": (
        dedup_video_incremental,
        video_incremental_oracle,
    ),
}
