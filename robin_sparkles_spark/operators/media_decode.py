"""REAL media decode kernels (r5 — VERDICT r4 "What's missing" #2).

The multimodal module's decode slots were container-constrained stubs
(no Pillow/torchaudio). These two kernels need nothing beyond the
stdlib + numpy, so they are REAL end-to-end decodes of real file
formats:

- ``bmp_decode_stats``: parses 24-bit BITMAPINFOHEADER BMPs byte-for-
  byte (struct header parse, padded bottom-up pixel rows via numpy)
  and emits true dimensions + per-channel pixel sums;
- ``wav_decode_stats``: decodes 16-bit PCM mono WAV through the
  stdlib ``wave`` module and emits sample count/rate + amplitude
  stats from the actual PCM frames.

The payloads are synthesized DETERMINISTICALLY from ``media_id``
(driver-side, staged once as parquet under spark-warehouse/ — the
``sources.staging`` fingerprint contract), so the DuckDB oracle can
recompute every decoded number in closed form over the SAME staged
table: generate the pixel/sample grids with ``range()`` and apply the
synthesis arithmetic. Equality of (real byte parse) vs (closed-form
arithmetic) proves the decode is correct — a stronger check than
comparing two byte-parsers, since header-layout or padding bugs on
the Spark side cannot cancel out on the oracle side.

UDF-policy note: decode kernels are the sanctioned Python path — a
byte-format parse has no Catalyst expression, so these two queries run
``mapInPandas`` (Arrow-batched; Python cost per batch, never per row).
``tests/test_plans.py`` pins the allowlist: MapInPandas may appear in
exactly these plans, row-at-a-time eval in none.

100 TB design: payloads ride parquet as BYTE_ARRAY; the mime filter is
pushed to the scan; decode is a per-row projection (no shuffle, no
state) so it scales embarrassingly with partitions — exactly the shape
a real image/audio featurization pass has.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table
from ..sources.staging import is_staged, stage_width, staged_path

MEDIA_N = 500  # media rows per kind (min'd with the doc count)

# BMP synthesis parameters — every decoded stat below derives from
# these formulas; the oracle re-evaluates them in SQL.
#   w = 4 + id % 13   (4..16)      h = 3 + id % 7   (3..9)
#   r = (3·id + x + 7y) % 256, g = (2·id + 5x + y) % 256,
#   b = (id + 2x + 3y) % 256      for x < w, y < h
BMP_W_MAX = 16
BMP_H_MAX = 9

# WAV synthesis: n = 64 + id % 129 samples (64..192) of 16-bit PCM
# mono at 8 kHz, sample_i = ((31·id + 17·i) % 4001) − 2000.
WAV_N_MAX = 192
WAV_RATE = 8000


def synth_bmp(media_id: int) -> bytes:
    """A real, spec-valid 24bpp BI_RGB BMP (54-byte header + bottom-up
    pixel rows padded to 4 bytes)."""
    w = 4 + media_id % 13
    h = 3 + media_id % 7
    row_size = (w * 3 + 3) // 4 * 4
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # stored bottom-up
        row = bytearray()
        for x in range(w):
            row.append((media_id + 2 * x + 3 * y) % 256)      # B
            row.append((2 * media_id + 5 * x + y) % 256)      # G
            row.append((3 * media_id + x + 7 * y) % 256)      # R
        row.extend(b"\x00" * (row_size - len(row)))
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def synth_wav(media_id: int) -> bytes:
    """A real RIFF/WAVE file: 16-bit PCM mono via the stdlib writer."""
    n = 64 + media_id % 129
    samples = [((31 * media_id + 17 * i) % 4001) - 2000 for i in range(n)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(WAV_RATE)
        wf.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def media_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "media_corpus", "documents")


def stage_media_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently stage (media_id, mime, payload) rows — one BMP and
    one WAV per media_id — as parquet. Synthesis is driver-side pure
    Python over literal ids (bounded at MEDIA_N), so the staged bytes
    are bit-identical across runs and engines read one shared table."""
    path = media_corpus_path(sf_dir)
    if is_staged(path):
        return path
    n_docs = load_table(spark, sf_dir, "documents").count()
    n = min(MEDIA_N, n_docs)
    rows = [(i, "image/bmp", synth_bmp(i)) for i in range(n)]
    rows += [(i, "audio/wav", synth_wav(i)) for i in range(n)]
    spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    ).repartition(stage_width(len(rows))).write.mode("overwrite").parquet(path)
    return path


def bmp_pixels(blob: bytes) -> "np.ndarray":
    """REAL BMP decode of one payload → top-down RGB array of shape
    (h, w, 3), int64. Header fields via struct, pixel rows via numpy
    reshape (padding stripped, bottom-up storage flipped). Shared by
    the decode-stats kernel and image perceptual-hash dedup (r11)."""
    magic, _fsize, _r1, _r2, offset = struct.unpack_from("<2sIHHI", blob, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hsz, w, h, _planes, bpp = struct.unpack_from("<IiiHH", blob, 14)
    if h < 0:  # top-down DIB: signed height per the BMP spec (r11,
        # ADVICE: the multimodal sniff read this field unsigned)
        raise ValueError("top-down BMP unsupported (negative biHeight)")
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    row_size = (w * 3 + 3) // 4 * 4
    bgr = (
        np.frombuffer(blob, np.uint8, count=row_size * h, offset=offset)
        .reshape(h, row_size)[:, : w * 3]
        .reshape(h, w, 3)
        .astype(np.int64)
    )
    return bgr[::-1, :, ::-1]  # bottom-up rows, BGR order → top-down RGB


def decode_bmp(df: DataFrame) -> DataFrame:
    """REAL BMP decode over Arrow batches: header fields via struct,
    pixel rows via numpy reshape (padding stripped), channel sums over
    the actual stored bytes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rgb = bmp_pixels(bytes(payload))
                except ValueError as exc:
                    raise ValueError(f"media_id {mid}: {exc}") from exc
                h, w = rgb.shape[:2]
                recs.append(
                    (
                        mid,
                        w,
                        h,
                        w * h,
                        int(rgb[:, :, 0].sum()),
                        int(rgb[:, :, 1].sum()),
                        int(rgb[:, :, 2].sum()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "width", "height", "n_pixels",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return df.mapInPandas(
        kernel,
        schema="media_id long, width int, height int, n_pixels long, "
        "sum_r long, sum_g long, sum_b long",
    )


def decode_wav(df: DataFrame) -> DataFrame:
    """REAL WAV decode: stdlib ``wave`` parses the RIFF container, the
    PCM frames come out via numpy int16 view."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as wf:
                    if wf.getnchannels() != 1 or wf.getsampwidth() != 2:
                        raise ValueError(f"media_id {mid}: not 16-bit mono PCM")
                    n = wf.getnframes()
                    rate = wf.getframerate()  # read before close: a
                    # wave impl may drop header state on exit
                    pcm = np.frombuffer(wf.readframes(n), dtype="<i2")
                recs.append(
                    (
                        mid,
                        n,
                        rate,
                        int(pcm.astype(np.int64).sum()),
                        int(pcm.min()),
                        int(pcm.max()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "n_samples", "framerate",
                    "sum_amp", "min_amp", "max_amp",
                ],
            )

    return df.mapInPandas(
        kernel,
        schema="media_id long, n_samples long, framerate int, "
        "sum_amp long, min_amp int, max_amp int",
    )


def bmp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every staged BMP and report true dimensions + channel
    sums. The mime filter reaches the parquet scan (PushedFilters);
    decode is a stateless per-row projection."""
    media = spark.read.parquet(stage_media_corpus(spark, sf_dir))
    return decode_bmp(media.where(F.col("mime") == "image/bmp"))


def wav_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every staged WAV and report sample stats from the real
    PCM frames."""
    media = spark.read.parquet(stage_media_corpus(spark, sf_dir))
    return decode_wav(media.where(F.col("mime") == "audio/wav"))


# --- PNG (r6 — VERDICT r5 ask #5) -------------------------------------------
# PNG synthesis: w = 5 + id % 12 (5..16), h = 3 + id % 6 (3..8),
#   r = (7·id + 3x + y) % 256, g = (5·id + x + 2y) % 256,
#   b = (2·id + 4x + 5y) % 256,
# 8-bit truecolor, non-interlaced, scanline filter type (id + y) % 5 —
# the corpus exercises ALL FIVE PNG filters (None/Sub/Up/Average/
# Paeth), so the decoder's defilter path is genuinely tested, not just
# the zlib inflate. Pure stdlib both ways: zlib + struct + crc32.
PNG_W_MAX = 16
PNG_H_MAX = 8
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = 3  # 8-bit RGB


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_pixel(media_id: int, x: int, y: int) -> tuple[int, int, int]:
    return (
        (7 * media_id + 3 * x + y) % 256,
        (5 * media_id + x + 2 * y) % 256,
        (2 * media_id + 4 * x + 5 * y) % 256,
    )


def synth_png(media_id: int) -> bytes:
    """A real, spec-valid PNG: IHDR + one zlib IDAT of filtered
    scanlines + IEND, CRC-32 per chunk, filter type cycling through
    all five per row."""
    import zlib

    w = 5 + media_id % 12
    h = 3 + media_id % 6
    raws = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            row.extend(_png_pixel(media_id, x, y))
        raws.append(bytes(row))
    stream = bytearray()
    prev = bytes(w * _PNG_BPP)
    for y, raw in enumerate(raws):
        f = (media_id + y) % 5
        stream.append(f)
        for i, v in enumerate(raw):
            a = raw[i - _PNG_BPP] if i >= _PNG_BPP else 0
            b = prev[i]
            c = prev[i - _PNG_BPP] if i >= _PNG_BPP else 0
            pred = (0, a, b, (a + b) // 2, _paeth(a, b, c))[f]
            stream.append((v - pred) % 256)
        prev = raw

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def png_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "png_corpus", "documents")


def stage_png_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Separate staged table from the BMP/WAV corpus: staging is
    fingerprint-keyed on the SOURCE parquet only, so appending a new
    mime to the existing media_corpus would be masked by its already-
    green _SUCCESS marker."""
    path = png_corpus_path(sf_dir)
    if is_staged(path):
        return path
    n_docs = load_table(spark, sf_dir, "documents").count()
    n = min(MEDIA_N, n_docs)
    rows = [(i, "image/png", synth_png(i)) for i in range(n)]
    spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    ).repartition(stage_width(len(rows))).write.mode("overwrite").parquet(path)
    return path


def png_pixels(blob: bytes) -> "np.ndarray":
    """REAL PNG decode of one payload → top-down RGB array of shape
    (h, w, 3), int64: chunk walk with CRC-32 verification, zlib
    inflate, full scanline defilter (None/Sub/Up/Average/Paeth —
    sequential along x by spec, so the inner loop is per-byte Python;
    images here are small and a production deploy swaps in a C codec
    behind the same signature). Shared by the decode-stats kernel and
    image perceptual-hash dedup (r11)."""
    import zlib

    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, w, h = 8, bytearray(), None, None
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad {tag!r} CRC")
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, ilace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype, ilace) != (8, 2, 0):
                raise ValueError(
                    f"unsupported PNG "
                    f"(depth={depth} color={ctype} interlace={ilace})"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = w * _PNG_BPP
    rows, prev, rpos = [], bytearray(stride), 0
    for _y in range(h):
        f = raw[rpos]
        line = raw[rpos + 1 : rpos + 1 + stride]
        rpos += 1 + stride
        cur = bytearray(stride)
        for i in range(stride):
            a = cur[i - _PNG_BPP] if i >= _PNG_BPP else 0
            b = prev[i]
            c = prev[i - _PNG_BPP] if i >= _PNG_BPP else 0
            if f > 4:
                raise ValueError(f"filter {f}")
            pred = (0, a, b, (a + b) // 2, _paeth(a, b, c))[f]
            cur[i] = (line[i] + pred) % 256
        rows.append(bytes(cur))
        prev = cur
    return (
        np.frombuffer(b"".join(rows), np.uint8)
        .reshape(h, w, _PNG_BPP)
        .astype(np.int64)
    )


def decode_png(df: DataFrame) -> DataFrame:
    """REAL PNG decode over Arrow batches — see :func:`png_pixels`
    for the per-payload decode; this kernel reports dimension +
    channel-sum stats over the true decoded pixels."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    px = png_pixels(bytes(payload))
                except ValueError as exc:
                    raise ValueError(f"media_id {mid}: {exc}") from exc
                h, w = px.shape[:2]
                recs.append(
                    (
                        mid,
                        w,
                        h,
                        w * h,
                        int(px[:, :, 0].sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "width", "height", "n_pixels",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return df.mapInPandas(
        kernel,
        schema="media_id long, width int, height int, n_pixels long, "
        "sum_r long, sum_g long, sum_b long",
    )


def png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every staged PNG and report true dimensions + channel
    sums — (CRC-verified chunk parse + inflate + defilter) vs the
    oracle's closed-form synthesis arithmetic."""
    media = spark.read.parquet(stage_png_corpus(spark, sf_dir))
    return decode_png(media.where(F.col("mime") == "image/png"))


def png_oracle(sf_dir: str) -> str:
    from ..session import active_or_local

    path = stage_png_corpus(active_or_local("media_decode_oracle"), sf_dir)
    return f"""
WITH m AS (SELECT media_id FROM read_parquet('{path}/*.parquet')
           WHERE mime = 'image/png'),
dims AS (SELECT media_id, 5 + media_id % 12 AS w, 3 + media_id % 6 AS h FROM m)
SELECT d.media_id,
       CAST(d.w AS INT) AS width,
       CAST(d.h AS INT) AS height,
       CAST(d.w * d.h AS BIGINT) AS n_pixels,
       CAST(SUM((7 * d.media_id + 3 * x.range + y.range) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((5 * d.media_id + x.range + 2 * y.range) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((2 * d.media_id + 4 * x.range + 5 * y.range) % 256) AS BIGINT) AS sum_b
FROM dims d, range({PNG_W_MAX}) x, range({PNG_H_MAX}) y
WHERE x.range < d.w AND y.range < d.h
GROUP BY d.media_id, d.w, d.h
"""


def _staged_rel(sf_dir: str) -> str:
    from ..session import active_or_local

    path = stage_media_corpus(active_or_local("media_decode_oracle"), sf_dir)
    return f"read_parquet('{path}/*.parquet')"


def bmp_oracle(sf_dir: str) -> str:
    """Closed-form twin of the synthesis arithmetic over the SAME
    staged table — agreement with the byte-parsing Spark side proves
    the decode (see module docstring)."""
    rel = _staged_rel(sf_dir)
    return f"""
WITH m AS (SELECT media_id FROM {rel} WHERE mime = 'image/bmp'),
dims AS (SELECT media_id, 4 + media_id % 13 AS w, 3 + media_id % 7 AS h FROM m)
SELECT d.media_id,
       CAST(d.w AS INT) AS width,
       CAST(d.h AS INT) AS height,
       CAST(d.w * d.h AS BIGINT) AS n_pixels,
       CAST(SUM((3 * d.media_id + x.range + 7 * y.range) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((2 * d.media_id + 5 * x.range + y.range) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((d.media_id + 2 * x.range + 3 * y.range) % 256) AS BIGINT) AS sum_b
FROM dims d, range({BMP_W_MAX}) x, range({BMP_H_MAX}) y
WHERE x.range < d.w AND y.range < d.h
GROUP BY d.media_id, d.w, d.h
"""


def wav_oracle(sf_dir: str) -> str:
    rel = _staged_rel(sf_dir)
    return f"""
WITH m AS (SELECT media_id FROM {rel} WHERE mime = 'audio/wav'),
dims AS (SELECT media_id, 64 + media_id % 129 AS n FROM m)
SELECT d.media_id,
       CAST(d.n AS BIGINT) AS n_samples,
       CAST({WAV_RATE} AS INT) AS framerate,
       CAST(SUM((31 * d.media_id + 17 * i.range) % 4001 - 2000) AS BIGINT) AS sum_amp,
       CAST(MIN((31 * d.media_id + 17 * i.range) % 4001 - 2000) AS INT) AS min_amp,
       CAST(MAX((31 * d.media_id + 17 * i.range) % 4001 - 2000) AS INT) AS max_amp
FROM dims d, range({WAV_N_MAX}) i
WHERE i.range < d.n
GROUP BY d.media_id, d.n
"""


# --- resize / frame features (r9) -------------------------------------------
#
# The two preprocessing stages the multimodal north-star names that
# were still missing: RESIZE (images) and FEATURE-EXTRACT (audio) —
# both exact integer arithmetic (floor-mean box filter; energy and
# zero-crossing counts), so the closed-form oracles replay them
# bit-for-bit. At 100 TB both are stateless per-row projections like
# the decodes: no shuffle, embarrassingly partition-parallel.

RESIZE_FACTOR = 2  # 2×2 box filter, odd edges dropped
WAV_FRAME = 32  # samples per analysis frame (tail dropped)


def bmp_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + 2× box-downsample every staged BMP: each output pixel
    is the floor-mean of its 2×2 input block per channel (the classic
    integer-exact resize for vision-training pipelines). Reports
    half-res dimensions and downsampled channel sums."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                blob = bytes(payload)
                magic, _fs, _r1, _r2, offset = struct.unpack_from(
                    "<2sIHHI", blob, 0
                )
                if magic != b"BM":
                    raise ValueError(f"media_id {mid}: not a BMP payload")
                _hsz, w, h, _pl, bpp = struct.unpack_from("<IiiHH", blob, 14)
                if bpp != 24:
                    raise ValueError(f"media_id {mid}: unsupported bpp {bpp}")
                row_size = (w * 3 + 3) // 4 * 4
                px = (
                    np.frombuffer(
                        blob, np.uint8, count=row_size * h, offset=offset
                    )
                    .reshape(h, row_size)[:, : w * 3]
                    .reshape(h, w, 3)
                    .astype(np.int64)[::-1]  # bottom-up rows -> top-down
                )
                w2, h2 = w // RESIZE_FACTOR, h // RESIZE_FACTOR
                crop = px[: h2 * RESIZE_FACTOR, : w2 * RESIZE_FACTOR]
                small = (
                    crop.reshape(h2, RESIZE_FACTOR, w2, RESIZE_FACTOR, 3)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(h2, w2, RESIZE_FACTOR * RESIZE_FACTOR, 3)
                    .sum(axis=2)
                    // (RESIZE_FACTOR * RESIZE_FACTOR)
                )
                recs.append(
                    (
                        mid,
                        w2,
                        h2,
                        w2 * h2,
                        int(small[:, :, 2].sum()),  # R (BGR order)
                        int(small[:, :, 1].sum()),
                        int(small[:, :, 0].sum()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "out_w", "out_h", "n_out_pixels",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    media = spark.read.parquet(stage_media_corpus(spark, sf_dir))
    return media.where(F.col("mime") == "image/bmp").mapInPandas(
        kernel,
        schema="media_id long, out_w int, out_h int, n_out_pixels long, "
        "sum_r long, sum_g long, sum_b long",
    )


def bmp_resize_oracle(sf_dir: str) -> str:
    """Closed-form replay of the 2×2 floor-mean: the four synthesis
    pixels of each output block, summed and integer-divided exactly
    as the kernel does."""
    rel = _staged_rel(sf_dir)

    def chan(expr: str) -> str:
        # Σ over the 2×2 block of ((expr at (2x2+dx, 2y2+dy)) % 256),
        # then floor-div 4 — dx/dy unrolled
        terms = " + ".join(
            f"(({expr.replace('X', f'(2 * x2.range + {dx})').replace('Y', f'(2 * y2.range + {dy})')}) % 256)"
            for dx in range(RESIZE_FACTOR)
            for dy in range(RESIZE_FACTOR)
        )
        return f"(({terms}) // {RESIZE_FACTOR * RESIZE_FACTOR})"

    r = chan("3 * d.media_id + X + 7 * Y")
    g = chan("2 * d.media_id + 5 * X + Y")
    b = chan("d.media_id + 2 * X + 3 * Y")
    return f"""
WITH m AS (SELECT media_id FROM {rel} WHERE mime = 'image/bmp'),
dims AS (SELECT media_id, (4 + media_id % 13) // 2 AS w2,
                (3 + media_id % 7) // 2 AS h2 FROM m)
SELECT d.media_id,
       CAST(d.w2 AS INT) AS out_w,
       CAST(d.h2 AS INT) AS out_h,
       CAST(d.w2 * d.h2 AS BIGINT) AS n_out_pixels,
       CAST(SUM({r}) AS BIGINT) AS sum_r,
       CAST(SUM({g}) AS BIGINT) AS sum_g,
       CAST(SUM({b}) AS BIGINT) AS sum_b
FROM dims d, range({BMP_W_MAX // 2}) x2, range({BMP_H_MAX // 2}) y2
WHERE x2.range < d.w2 AND y2.range < d.h2
GROUP BY d.media_id, d.w2, d.h2
"""


def wav_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: frame the PCM into WAV_FRAME-sample
    windows (tail dropped) and report per-file frame count, total and
    max frame ENERGY (Σ s², exact int64) and total ZERO CROSSINGS
    (sign flips within frames) — the integer core of the VAD/energy
    features an audio-curation pipeline computes before any
    lib-bound spectral stage."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as wf:
                    if wf.getnchannels() != 1 or wf.getsampwidth() != 2:
                        raise ValueError(
                            f"media_id {mid}: not 16-bit mono PCM"
                        )
                    n = wf.getnframes()
                    pcm = np.frombuffer(
                        wf.readframes(n), dtype="<i2"
                    ).astype(np.int64)
                n_frames = n // WAV_FRAME
                framed = pcm[: n_frames * WAV_FRAME].reshape(
                    n_frames, WAV_FRAME
                )
                energy = (framed * framed).sum(axis=1)
                nonneg = framed >= 0
                zc = (nonneg[:, 1:] != nonneg[:, :-1]).sum(axis=1)
                recs.append(
                    (
                        mid,
                        int(n_frames),
                        int(energy.sum()),
                        int(energy.max()) if n_frames else 0,
                        int(zc.sum()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "n_frames", "total_energy",
                    "max_frame_energy", "total_zc",
                ],
            )

    media = spark.read.parquet(stage_media_corpus(spark, sf_dir))
    return media.where(F.col("mime") == "audio/wav").mapInPandas(
        kernel,
        schema="media_id long, n_frames long, total_energy long, "
        "max_frame_energy long, total_zc long",
    )


def wav_frame_oracle(sf_dir: str) -> str:
    """Closed-form replay: s_i = ((31·id + 17·i) % 4001) − 2000 framed
    at WAV_FRAME, per-frame energy/zc in an inner aggregate, per-file
    rollup outside."""
    rel = _staged_rel(sf_dir)
    s = "((31 * media_id + 17 * i.range) % 4001 - 2000)"
    s_prev = "((31 * media_id + 17 * (i.range - 1)) % 4001 - 2000)"
    return f"""
WITH m AS (SELECT media_id FROM {rel} WHERE mime = 'audio/wav'),
dims AS (SELECT media_id, 64 + media_id % 129 AS n FROM m),
samp AS (
  SELECT d.media_id, i.range AS i, i.range // {WAV_FRAME} AS frame,
         {s} AS s,
         CASE WHEN i.range % {WAV_FRAME} != 0
              AND (({s} >= 0) != ({s_prev} >= 0)) THEN 1 ELSE 0 END AS zc
  FROM dims d, range({WAV_N_MAX}) i
  WHERE i.range < (d.n // {WAV_FRAME}) * {WAV_FRAME}
),
frames AS (
  SELECT media_id, frame, SUM(s * s) AS energy, SUM(zc) AS zc
  FROM samp GROUP BY media_id, frame
)
SELECT media_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(energy) AS BIGINT) AS total_energy,
       CAST(MAX(energy) AS BIGINT) AS max_frame_energy,
       CAST(SUM(zc) AS BIGINT) AS total_zc
FROM frames
GROUP BY media_id
"""


QUERIES = {
    "bmp_decode_stats": (bmp_decode_stats, bmp_oracle),
    "wav_decode_stats": (wav_decode_stats, wav_oracle),
    "png_decode_stats": (png_decode_stats, png_oracle),
    "bmp_resize_stats": (bmp_resize_stats, bmp_resize_oracle),
    "wav_frame_features": (wav_frame_features, wav_frame_oracle),
}
