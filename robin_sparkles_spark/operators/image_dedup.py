"""Image near-duplicate dedup via perceptual hashing (r11 — VERDICT
r10 ask #4): dHash over REAL decoded pixels, hamming-banded with the
same combinatorial pigeonhole blocking that ships for text simhash.

This composes two proven stacks into the standard image-corpus
curation operator (the one LLM-pipeline modality whose dedup was
still text-only):

- **Decode**: the real byte kernels from ``media_decode`` —
  ``bmp_pixels`` (struct + numpy, bottom-up BGR → RGB) and
  ``png_pixels`` (chunk walk + CRC-32 + zlib + full defilter). The
  corpus stages the SAME image in multiple containers, so the
  operator demonstrates the perceptual hash's load-bearing property:
  dedup is FORMAT-INVARIANT (a BMP and its PNG re-encode hash
  identically; JPEG decode from ``container_parse`` is
  kernel-compatible the same way).
- **dHash** (difference hash): grayscale (integer milli-weights
  299/587/114 — exact in every engine), area-mean downsample to a
  9×8 grid (cell (cx,cy) owns pixels with (x·9)//w == cx and
  (y·8)//h == cy — an exact partition, so the oracle can recompute
  it in SQL), then one bit per horizontally-adjacent cell pair:
  bit = mean(right) > mean(left), compared exactly via integer
  cross-multiplication (sum_r·n_l > sum_l·n_r). 63 bits (the last of
  the 64 comparisons is dropped): a 64th bit would need 1<<63, which
  overflows signed BIGINT in DuckDB (raises) and Python-int→Spark
  literals alike — 63 exact bits beat 64 dialect-dependent ones.
- **Blocking**: :func:`dedup.hamming_blocked_pairs` — the
  pigeonhole-blocked self-equi-join (SHUFFLE_HASH-pinned, canonical
  subset filter, no candidate distinct) shared with ``dedup_simhash``,
  with chunk widths chosen adaptively from the corpus count (key_bits
  ∝ log2 N — the r10 sizing law).

100 TB design: decode+hash is a map-only Arrow-batched projection
(embarrassingly parallel, no shuffle); the pair search is the blocked
equi-join on short keys whose scale posture the r10 probes already
measured for simhash (1.63× @ 10×). Perceptual hashes are 8 bytes per
image — the join input is tiny relative to the pixel data, which
never shuffles.

Planted fixture (closed-form, oracle-recomputable):
- base BMP per image_id (w=12+id%18, h=9+id%10 — every 9×8 grid cell
  is non-empty);
- for id % 5 == 0 a near-dup BMP variant with 3 deterministic pixel
  overrides — each changed pixel touches one grid cell, each cell at
  most 2 comparisons, so hamming ≤ 6 STRUCTURALLY (= the declared
  threshold);
- for id % 7 == 0 a PNG re-encode of the identical pixels (filters
  cycle through all five types) — hamming exactly 0 cross-format.
Unrelated images hash ~uniformly (multiplicative id↔position mixing,
per-channel coefficients decoupled through distinct prime moduli —
see ``_image_pixel`` for the r11 aliasing fix the 10× probe forced):
P(hamming ≤ 6) ≈ 7·10⁻¹² per pair, and the planted count is EXACTLY
the output at both fixture and 10×-probe scales.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.barrier import barrier
from ..sources import load_table
from ..sources.staging import is_staged, stage_width, staged_path
from .dedup import hamming_blocked_pairs
from .media_decode import _PNG_SIG, bmp_pixels, png_pixels

IMAGE_N = 400  # base images (min'd with the doc count)
IMAGE_MAX_HAMMING = 6
DHASH_GRID_W, DHASH_GRID_H = 9, 8
DHASH_BITS = 63

# Adaptive pigeonhole layouts (key_bits ∝ log2 N — same law and same
# config-table pattern as dedup.SIMHASH_BLOCK_CONFIGS): with k=6,
# m chunks key on (m−6)-subsets. m=8 → C(8,2)=28 keys/row of ~15-16
# bits; m=9 → C(9,3)=84 keys/row of ~21 bits (fewer random collisions
# per bucket at large N, paid in explode rows). Every config yields
# the IDENTICAL exact output.
IMAGE_BLOCK_CONFIGS: tuple[tuple[int | None, tuple[int, ...]], ...] = (
    (100_000, (8, 8, 8, 8, 8, 8, 8, 7)),
    (None, (7, 7, 7, 7, 7, 7, 7, 7, 7)),
)
assert all(sum(w) == DHASH_BITS for _, w in IMAGE_BLOCK_CONFIGS)


def _image_block_widths(n_images: int) -> tuple[int, ...]:
    for ceiling, widths in IMAGE_BLOCK_CONFIGS:
        if ceiling is None or n_images <= ceiling:
            return widths
    raise AssertionError("unreachable: last config has no ceiling")


# --- closed-form corpus -----------------------------------------------------


def _image_dims(image_id: int) -> tuple[int, int]:
    return 12 + image_id % 18, 9 + image_id % 10


def _image_pixel(image_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Base RGB formulas — multiplicative id↔position mixing so
    different images decorrelate (a purely additive id term would be a
    uniform brightness shift mod 256, which dHash half-ignores).

    Each channel mixes TWO coefficients drawn through DISTINCT PRIME
    moduli on independent positional bases. The first r11 form used
    coefficients linear in id mod 256, which alias with period 256 —
    ids i and i+256 rendered the same pixel function at different
    dims (dHash is resize-invariant by design, so different dims
    don't save it), and the 10× scale probe surfaced ~2900 hash
    near-collisions at 4000 images (25 already inside the 400-image
    fixture); one prime modulus per channel still left ~450
    single-channel function repeats (space of only ~250 coefficients)
    whose shared gray component pulled pairs under the threshold.
    With two coefficients per channel the single-channel repeat rate
    is ~1/(251·233) per pair and a full-pixel collision needs all six
    to align — probe-verified: planted count == output at 10×."""
    r = (
        ((3 * image_id + 7) % 251 + 3) * (x + 7 * y + 1)
        + ((11 * image_id + 19) % 233) * (x * y + 1)
    ) % 256
    g = (
        ((5 * image_id + 11) % 241 + 5) * (3 * x + y + 2)
        + ((13 * image_id + 23) % 229) * (x * y + 2)
    ) % 256
    b = (
        ((7 * image_id + 13) % 239 + 7) * (x + y + 1)
        + ((17 * image_id + 29) % 227) * (2 * x * y + 1)
    ) % 256
    return r, g, b


def _perturb_positions(image_id: int, w: int, h: int):
    """The 3 deterministic pixel overrides of the near-dup variant,
    in application order (later entries win on position collision —
    the oracle checks p descending for the same last-wins rule)."""
    return [
        (
            (image_id + 5 * p) % w,
            (2 * image_id + 3 * p) % h,
            (37 * image_id + 91 * p) % 256,
        )
        for p in range(3)
    ]


def _image_pixels(image_id: int, variant: int) -> np.ndarray:
    w, h = _image_dims(image_id)
    px = np.zeros((h, w, 3), np.int64)
    for y in range(h):
        for x in range(w):
            px[y, x] = _image_pixel(image_id, x, y)
    if variant == 1:
        for xp, yp, v in _perturb_positions(image_id, w, h):
            px[yp, xp] = (v, v, v)
    return px


def _encode_bmp(px: np.ndarray) -> bytes:
    """Spec-valid 24bpp BI_RGB BMP of a top-down RGB array (stored
    bottom-up BGR, rows padded to 4 bytes) — the exact container
    ``media_decode.bmp_pixels`` decodes."""
    h, w = px.shape[:2]
    row_size = (w * 3 + 3) // 4 * 4
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - len(row))
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def _encode_png(px: np.ndarray, image_id: int) -> bytes:
    """Spec-valid 8-bit truecolor PNG of a top-down RGB array, row
    filter (image_id + y) % 5 — all five filter types appear across
    the corpus, so the REAL defilter path is exercised, same contract
    as ``media_decode.synth_png``."""
    h, w = px.shape[:2]

    def paeth(a: int, b: int, c: int) -> int:
        pp = a + b - c
        pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(w * 3)
    for y in range(h):
        line = bytes(
            int(px[y, x, ch]) for x in range(w) for ch in range(3)
        )
        f = (image_id + y) % 5
        raw.append(f)
        for i in range(w * 3):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            pred = (0, a, b, (a + b) // 2, paeth(a, b, c))[f]
            raw.append((line[i] - pred) % 256)
        prev = line

    def chunk(tag: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def image_corpus_path(sf_dir: str) -> str:
    # v2: prime-decoupled channel coefficients (the staging key
    # fingerprints the SOURCE parquet, not the synthesis formula, so
    # formula changes bump the name)
    return staged_path(sf_dir, "image_neardup_corpus_v2", "documents")


def stage_image_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently stage (img_id, image_id, variant, fmt, payload):
    variant 0 = base BMP (every id), 1 = 3-pixel-perturbed BMP
    (id % 5 == 0), 2 = PNG re-encode of the base pixels (id % 7 == 0).
    ``img_id = image_id * 10 + variant``. Driver-side pure Python over
    literal ids — bit-identical across runs and engines."""
    path = image_corpus_path(sf_dir)
    if is_staged(path):
        return path
    n_docs = load_table(spark, sf_dir, "documents").count()
    n = min(IMAGE_N, n_docs)
    rows = []
    for i in range(n):
        rows.append((i * 10, i, 0, "bmp", _encode_bmp(_image_pixels(i, 0))))
        if i % 5 == 0:
            rows.append(
                (i * 10 + 1, i, 1, "bmp", _encode_bmp(_image_pixels(i, 1)))
            )
        if i % 7 == 0:
            rows.append(
                (i * 10 + 2, i, 2, "png", _encode_png(_image_pixels(i, 0), i))
            )
    spark.createDataFrame(
        rows,
        "img_id long, image_id long, variant int, fmt string, payload binary",
    ).repartition(stage_width(len(rows))).write.mode("overwrite").parquet(path)
    return path


# --- dHash kernel -----------------------------------------------------------


def dhash_of_pixels(rgb: np.ndarray) -> int:
    """63-bit dHash of a top-down RGB array — integer-exact (see
    module docstring): milli-weight grayscale, exact-partition 9×8
    area means, cross-multiplied comparisons."""
    gray = rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114
    return dhash_of_gray(gray)


def dhash_of_gray(gray: np.ndarray) -> int:
    """63-bit dHash of a top-down 2-D integer luminance array. The
    comparisons are scale-invariant (cross-multiplied means), so
    milli-weighted RGB gray and raw 8-bit gray (``video_dedup``'s
    grayscale TIFF frames) use the identical kernel."""
    h, w = gray.shape[:2]
    gray = gray.astype(np.int64)
    ix = (np.arange(w) * DHASH_GRID_W) // w
    iy = (np.arange(h) * DHASH_GRID_H) // h
    sums = np.zeros((DHASH_GRID_H, DHASH_GRID_W), np.int64)
    counts = np.zeros((DHASH_GRID_H, DHASH_GRID_W), np.int64)
    np.add.at(sums, (iy[:, None], np.broadcast_to(ix, (h, w))), gray)
    np.add.at(counts, (iy[:, None], np.broadcast_to(ix, (h, w))), 1)
    if (counts == 0).any():
        raise ValueError(f"empty dHash grid cell for {w}x{h} image")
    value = 0
    for bit in range(DHASH_BITS):
        cy, cx = bit // 8, bit % 8
        if sums[cy, cx + 1] * counts[cy, cx] > sums[cy, cx] * counts[cy, cx + 1]:
            value |= 1 << bit
    return value


def image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(img_id, dhash) over the staged corpus: real format-dispatched
    pixel decode + dHash, as one Arrow-batched map-only projection."""
    return image_dhash_over(
        spark.read.parquet(stage_image_corpus(spark, sf_dir))
    )


def image_dhash_over(media: DataFrame) -> DataFrame:
    """The decode+hash kernel over any (img_id, fmt, payload) frame —
    split out so the 10× scale probe drives the exact shipped path."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            ids, hashes = [], []
            for img_id, fmt, payload in zip(
                pdf["img_id"], pdf["fmt"], pdf["payload"]
            ):
                blob = bytes(payload)
                rgb = bmp_pixels(blob) if fmt == "bmp" else png_pixels(blob)
                ids.append(img_id)
                hashes.append(dhash_of_pixels(rgb))
            yield pd.DataFrame({"img_id": ids, "dhash": hashes})

    return media.select("img_id", "fmt", "payload").mapInPandas(
        kernel, schema="img_id long, dhash long"
    )


# --- declared query ---------------------------------------------------------


def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup image pairs with Hamming(dHash) ≤ 6 — the standard
    image-corpus curation operator. Blocking layout adapts to the
    corpus count (parquet-metadata job, same precedent as simhash)."""
    n_images = spark.read.parquet(
        stage_image_corpus(spark, sf_dir)
    ).count()
    hashes = barrier(
        image_dhash(spark, sf_dir),
        "corpus",
        "image dhash table",
        eager=False,
    )
    return hamming_blocked_pairs(
        hashes,
        _image_block_widths(n_images),
        IMAGE_MAX_HAMMING,
        id_col="img_id",
        hash_col="dhash",
        out_cols=("img1", "img2", "hamming"),
    )


def dedup_image_phash_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """All-pairs hamming scan (broadcast NLJ) — pytest-only ground
    truth for the blocked form; never declared."""
    hashes = image_dhash(spark, sf_dir)
    a, b = hashes.alias("a"), hashes.alias("b")
    hamming = F.bit_count(
        F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))
    ).cast("long")
    return (
        a.join(F.broadcast(b), F.col("a.img_id") < F.col("b.img_id"))
        .select(
            F.col("a.img_id").alias("img1"),
            F.col("b.img_id").alias("img2"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= IMAGE_MAX_HAMMING)
    )


def phash_oracle_ctes(sf_dir: str) -> str:
    """The closed-form dHash pipeline as a reusable CTE body ending in
    ``hashes(img_id, dh)`` (+ ``dims`` with img_id/image_id/variant) —
    shared by the pair oracle below and the r11 image-text pair
    curation oracle."""
    from ..session import active_or_local

    path = stage_image_corpus(active_or_local("image_phash_oracle"), sf_dir)
    over = "1000 * ((37*d.image_id + {c}) % 256)"
    pos = (
        "d.variant = 1 AND x.range = (d.image_id + {a}) % d.w "
        "AND y.range = (2*d.image_id + {b}) % d.h"
    )
    return f"""dims AS (
  SELECT img_id, image_id, variant,
         12 + image_id % 18 AS w, 9 + image_id % 10 AS h
  FROM read_parquet('{path}/*.parquet')
),
px AS (
  SELECT d.img_id, x.range AS x, y.range AS y, d.w, d.h,
    CASE
      WHEN {pos.format(a=10, b=6)} THEN {over.format(c=182)}
      WHEN {pos.format(a=5, b=3)} THEN {over.format(c=91)}
      WHEN {pos.format(a=0, b=0)} THEN {over.format(c=0)}
      ELSE 299*((((3*d.image_id + 7) % 251 + 3) * (x.range + 7*y.range + 1)
                 + ((11*d.image_id + 19) % 233) * (x.range*y.range + 1)) % 256)
         + 587*((((5*d.image_id + 11) % 241 + 5) * (3*x.range + y.range + 2)
                 + ((13*d.image_id + 23) % 229) * (x.range*y.range + 2)) % 256)
         + 114*((((7*d.image_id + 13) % 239 + 7) * (x.range + y.range + 1)
                 + ((17*d.image_id + 29) % 227) * (2*x.range*y.range + 1)) % 256)
    END AS gray
  FROM dims d, range(30) x, range(19) y
  WHERE x.range < d.w AND y.range < d.h
),
cells AS (
  SELECT img_id, (x*{DHASH_GRID_W})//w AS cx, (y*{DHASH_GRID_H})//h AS cy,
         SUM(gray) AS s, COUNT(*) AS n
  FROM px GROUP BY 1, 2, 3
),
bits AS (
  SELECT c0.img_id, c0.cy*8 + c0.cx AS b,
         CASE WHEN c1.s * c0.n > c0.s * c1.n THEN 1 ELSE 0 END AS bit
  FROM cells c0 JOIN cells c1
    ON c1.img_id = c0.img_id AND c1.cy = c0.cy AND c1.cx = c0.cx + 1
  WHERE c0.cx < 8 AND c0.cy*8 + c0.cx < {DHASH_BITS}
),
hashes AS (
  SELECT img_id,
         SUM(CASE WHEN bit = 1 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS dh
  FROM bits GROUP BY img_id
)"""


def image_phash_oracle(sf_dir: str) -> str:
    """Closed-form DuckDB twin: regenerate every row's pixels from the
    synthesis formulas (perturbation checked p-descending = last-wins),
    aggregate the exact 9×8 cell partition, build the same 63-bit
    hash, and brute-force the qualifying pairs."""
    return f"""
WITH {phash_oracle_ctes(sf_dir)}
SELECT a.img_id AS img1, b.img_id AS img2,
       CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.img_id < b.img_id
WHERE bit_count(xor(a.dh, b.dh)) <= {IMAGE_MAX_HAMMING}
"""


# --- incremental dedup (r11, executing the written r12 candidate #3) ---------
#
# The ingest shape a production media pipeline actually runs: today's
# batch of images against the PERSISTED perceptual-hash index, without
# ever paying an index × index candidate term. Fixture split (pure
# img_id arithmetic, oracle-mirrored): the index holds the BASE images
# of families f % 4 != 3; the new batch is everything else — variants
# of indexed families (re-uploads → dups of their base) AND whole
# families f % 4 == 3 (genuinely new content → no match; their own
# variants also miss because within-batch dedup is the batch's own
# pass, same contract as the text `dedup_incremental`).


def _img_in_index() -> F.Column:
    fam = (F.col("img_id") / 10).cast("long")
    return (F.col("img_id") % 10 == 0) & (fam % 4 != 3)


def dedup_image_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup status of every NEW-batch image vs the index:
    (img_id, dup_of, hamming, is_dup). dup_of is the best index match
    (min hamming, ties → min index img_id) or −1; hamming is −1 for
    non-dups (integer sentinels — exact in both engines).

    Plan: one map-only hash pass over the staged table, arithmetic
    batch/index split, then :func:`dedup.hamming_blocked_pairs_between`
    (only batch + index rows explode; SHUFFLE_HASH-pinned equi-join),
    per-new-image argmin window (bounded — candidates per image), left
    join back to the batch."""
    from .dedup import hamming_blocked_pairs_between

    hashes = barrier(
        image_dhash(spark, sf_dir), "corpus", "image dhash table", eager=False
    )
    n_images = spark.read.parquet(
        stage_image_corpus(spark, sf_dir)
    ).count()
    widths = _image_block_widths(n_images)
    newh = hashes.where(~_img_in_index())
    index = hashes.where(_img_in_index())
    matches = hamming_blocked_pairs_between(
        newh,
        index,
        widths,
        IMAGE_MAX_HAMMING,
        id_col="img_id",
        hash_col="dhash",
        out_cols=("new_id", "index_id", "hamming"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("new_id").orderBy(F.asc("hamming"), F.asc("index_id"))
    best = (
        matches.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    batch = hashes.where(~_img_in_index()).select("img_id")
    return batch.join(best, batch.img_id == best.new_id, "left").select(
        "img_id",
        F.coalesce(F.col("index_id"), F.lit(-1)).cast("long").alias("dup_of"),
        F.coalesce(F.col("hamming"), F.lit(-1)).cast("long").alias("hamming"),
        F.col("index_id").isNotNull().alias("is_dup"),
    )


def image_incremental_oracle(sf_dir: str) -> str:
    """Shared dHash pipeline → arithmetic split → brute-force
    new×index best match → left join back to the batch."""
    return f"""
WITH {phash_oracle_ctes(sf_dir)},
split AS (
  SELECT img_id, dh,
         (img_id % 10 = 0 AND (img_id // 10) % 4 <> 3) AS in_index
  FROM hashes
),
matches AS (
  SELECT n.img_id AS new_id, i.img_id AS index_id,
         CAST(bit_count(xor(n.dh, i.dh)) AS BIGINT) AS hamming
  FROM split n JOIN split i ON NOT n.in_index AND i.in_index
  WHERE bit_count(xor(n.dh, i.dh)) <= {IMAGE_MAX_HAMMING}
),
best AS (
  SELECT new_id, index_id, hamming,
         ROW_NUMBER() OVER (PARTITION BY new_id
                            ORDER BY hamming ASC, index_id ASC) AS rn
  FROM matches
)
SELECT s.img_id,
       COALESCE(b.index_id, -1) AS dup_of,
       COALESCE(b.hamming, -1) AS hamming,
       b.index_id IS NOT NULL AS is_dup
FROM split s LEFT JOIN best b ON b.new_id = s.img_id AND b.rn = 1
WHERE NOT s.in_index
"""


QUERIES = {
    "dedup_image_phash": (dedup_image_phash, image_phash_oracle),
    "dedup_image_incremental": (
        dedup_image_incremental,
        image_incremental_oracle,
    ),
}


# --- streaming ingest batch twin (r11, SURVEY r12 candidate #3) --------------


def dedup_image_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming.media_ingest.media_ingest_stream`` —
    the IDENTICAL function over the batch scan of the staged arrivals
    directory and persisted hash index (every operator in it is
    streaming-legal, so batch and stream plans share expressions; the
    stream==batch parity pytest plus this oracle gate transitively
    check the readStream form, the §2.9 contract).

    Same semantics as :func:`dedup_image_incremental` — one verdict
    row per new-batch image, best match = min (hamming, index_id) —
    but the streaming-legal plan: grouped min(struct) aggregation
    instead of a row_number window (unsupported over streams), left
    outer candidate join instead of a post-hoc batch join-back."""
    from ..streaming.media_ingest import (
        ingest_dedup_stream,
        stage_arrivals,
        stage_index,
    )

    n_images = spark.read.parquet(stage_image_corpus(spark, sf_dir)).count()
    arrivals = spark.read.parquet(stage_arrivals(spark, sf_dir))
    index = spark.read.parquet(stage_index(spark, sf_dir))
    return ingest_dedup_stream(arrivals, index, n_images)


QUERIES_TAIL = {
    # Oracle shared with dedup_image_incremental: same verdict
    # semantics (the plans differ; the streaming one is the
    # aggregation shape), same closed-form dHash recomputation.
    "dedup_image_stream_ingest": (
        dedup_image_stream_ingest,
        image_incremental_oracle,
    ),
}
