"""REAL frame-sample kernel over a real multi-frame container (r5).

``operators.multimodal``'s frame-sample demonstrated the
cardinality-changing mapInPandas SHAPE over a fake byte layout; this
module upgrades the semantics to a REAL format: multi-page
uncompressed grayscale TIFF (II little-endian, one IFD per frame
chained through the next-IFD pointer — the spec'd mechanism
multi-frame TIFFs actually use). The synthesis writes the container
byte-for-byte (header, IFD entry tables, strip data) and the kernel
PARSES it back byte-for-byte: walks the IFD chain, reads the
width/length/strip tags, samples every ``FRAME_STRIDE``-th frame, and
sums the actual strip bytes.

Like media_decode, the payloads are synthesized deterministically
from ``media_id``, so the DuckDB oracle recomputes every decoded
number in closed form over the SAME staged table — byte-parse vs
arithmetic agreement proves the parser (an IFD-offset or strip-layout
bug cannot cancel out on the oracle side).

Output is CARDINALITY-CHANGING (one payload row → one row per sampled
frame): the mapInPandas contract the fixed-rate video sampler of a
multimodal training pipeline needs — which is exactly why this kernel
exists in the inventory.

100 TB design: identical to the other decode kernels — payloads ride
parquet BYTE_ARRAY, the mime filter pushes to the scan, decode is
stateless per-row fan-out, no shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table
from ..sources.staging import is_staged, stage_width, staged_path

VIDEO_N = 300  # clips staged (min'd with doc count)
FRAME_STRIDE = 2  # sample frames 0, 2, 4, …

# synthesis: frames = 2 + id % 4 (2..5); w = 5 + id % 6 (5..10);
# h = 4 + id % 5 (4..8); pixel(f, x, y) = (id + 11f + 2x + 5y) % 256
VID_FRAMES_MAX = 5
VID_W_MAX = 10
VID_H_MAX = 8

_TAG_WIDTH, _TAG_LENGTH = 256, 257
_TAG_BITS, _TAG_COMPRESSION, _TAG_PHOTOMETRIC = 258, 259, 262
_TAG_STRIP_OFFSETS, _TAG_SPP, _TAG_ROWS_PER_STRIP, _TAG_STRIP_BYTES = (
    273,
    277,
    278,
    279,
)


def _ifd_entry(tag: int, typ: int, count: int, value: int) -> bytes:
    return struct.pack("<HHII", tag, typ, count, value)


def synth_tiff(media_id: int) -> bytes:
    """A real multi-page TIFF: II header, per-frame single-strip
    uncompressed 8-bit grayscale, IFDs chained via next-IFD offsets."""
    n_frames = 2 + media_id % 4
    w = 5 + media_id % 6
    h = 4 + media_id % 5
    strips = []
    for f in range(n_frames):
        px = bytearray()
        for y in range(h):
            for x in range(w):
                px.append((media_id + 11 * f + 2 * x + 5 * y) % 256)
        strips.append(bytes(px))
    # layout: 8-byte header | all strips | IFD chain
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
    for f in range(n_frames):
        entries = b"".join(
            (
                _ifd_entry(_TAG_WIDTH, 3, 1, w),
                _ifd_entry(_TAG_LENGTH, 3, 1, h),
                _ifd_entry(_TAG_BITS, 3, 1, 8),
                _ifd_entry(_TAG_COMPRESSION, 3, 1, 1),  # none
                _ifd_entry(_TAG_PHOTOMETRIC, 3, 1, 1),  # BlackIsZero
                _ifd_entry(_TAG_STRIP_OFFSETS, 4, 1, strip_offsets[f]),
                _ifd_entry(_TAG_SPP, 3, 1, 1),
                _ifd_entry(_TAG_ROWS_PER_STRIP, 3, 1, h),
                _ifd_entry(_TAG_STRIP_BYTES, 4, 1, w * h),
            )
        )
        next_ifd = 0 if f == n_frames - 1 else ifd_start + (f + 1) * ifd_size
        out.append(struct.pack("<H", n_entries) + entries + struct.pack("<I", next_ifd))
    return b"".join(out)


def video_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "video_corpus", "documents")


def stage_video_corpus(spark: SparkSession, sf_dir: str) -> str:
    path = video_corpus_path(sf_dir)
    if is_staged(path):
        return path
    n = min(VIDEO_N, load_table(spark, sf_dir, "documents").count())
    rows = [(i, "image/tiff", synth_tiff(i)) for i in range(n)]
    spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    ).repartition(stage_width(len(rows))).write.mode("overwrite").parquet(path)
    return path


def sample_frames(df: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """REAL IFD-chain walk + strip decode, emitting one row per
    SAMPLED frame (cardinality-changing mapInPandas)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                blob = bytes(payload)
                order, magic, ifd_off = struct.unpack_from("<2sHI", blob, 0)
                if order != b"II" or magic != 42:
                    raise ValueError(f"media_id {mid}: not a II TIFF")
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
                    if frame % stride != 0:
                        frame += 1
                        continue
                    w, h = tags[_TAG_WIDTH], tags[_TAG_LENGTH]
                    if tags.get(_TAG_COMPRESSION, 1) != 1:
                        raise ValueError(f"media_id {mid}: compressed TIFF")
                    off, nbytes = tags[_TAG_STRIP_OFFSETS], tags[_TAG_STRIP_BYTES]
                    px = np.frombuffer(blob, np.uint8, count=nbytes, offset=off)
                    recs.append(
                        (
                            mid,
                            frame,
                            w,
                            h,
                            int(px.astype(np.int64).sum()),
                            int(px.min()),
                            int(px.max()),
                        )
                    )
                    frame += 1
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "sum_px", "min_px", "max_px",
                ],
            )

    return df.mapInPandas(
        kernel,
        schema="media_id long, frame_idx int, width int, height int, "
        "sum_px long, min_px int, max_px int",
    )


def tiff_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample every FRAME_STRIDE-th frame of every staged clip and
    report true per-frame pixel stats from the parsed strips."""
    media = spark.read.parquet(stage_video_corpus(spark, sf_dir))
    return sample_frames(media.where(F.col("mime") == "image/tiff"))


def tiff_oracle(sf_dir: str) -> str:
    from ..session import active_or_local

    path = stage_video_corpus(active_or_local("video_decode_oracle"), sf_dir)
    rel = f"read_parquet('{path}/*.parquet')"
    px = "(d.media_id + 11 * f.range + 2 * x.range + 5 * y.range) % 256"
    return f"""
WITH m AS (SELECT media_id FROM {rel} WHERE mime = 'image/tiff'),
dims AS (SELECT media_id, 2 + media_id % 4 AS n_frames,
                5 + media_id % 6 AS w, 4 + media_id % 5 AS h
         FROM m)
SELECT d.media_id,
       CAST(f.range AS INT) AS frame_idx,
       CAST(d.w AS INT) AS width,
       CAST(d.h AS INT) AS height,
       CAST(SUM({px}) AS BIGINT) AS sum_px,
       CAST(MIN({px}) AS INT) AS min_px,
       CAST(MAX({px}) AS INT) AS max_px
FROM dims d, range({VID_FRAMES_MAX}) f, range({VID_W_MAX}) x, range({VID_H_MAX}) y
WHERE f.range < d.n_frames AND f.range % {FRAME_STRIDE} = 0
  AND x.range < d.w AND y.range < d.h
GROUP BY d.media_id, f.range, d.w, d.h
"""


QUERIES = {
    "tiff_frame_sample": (tiff_frame_sample, tiff_oracle),
}
