"""Multimodal-column operators (EXT — BASELINE.json north star):
image/audio/video as opaque ``binary`` columns with typed metadata.

The container has no image/audio libraries, so the decode kernels
HERE are STUBBED (deterministic fakes / NotImplementedError, clearly
marked) — but the Spark-side plumbing is real and tested: schemas,
Arrow batch shape, ``mapInPandas`` iteration, partition behavior.
Swapping a stub for Pillow/torchaudio is a one-function change that
touches no plan. The REAL kernels live next door where the stdlib
suffices: full pixel/audio decodes for BMP/WAV/TIFF/PNG
(``media_decode``, ``video_decode``) and structural container parses
for MP4/MP3/JPEG (``container_parse`` — box trees, frame walks,
marker scans; only the entropy/signal layer of those three formats
remains library-gated).

Design notes (100 TB):
- binary payloads ride parquet as BYTE_ARRAY; metadata extraction is
  a per-row projection (no shuffle);
- decode / feature-extract run as ``mapInPandas`` over Arrow record
  batches — Python cost is per-batch, not per-row, and each partition
  streams (never materializes the whole partition);
- frame-sampling/resize emit MORE rows/columns than they consume —
  mapInPandas (not pandas_udf) because the cardinality changes.

The ``multimodal_meta`` query is the oracle-checked slice: a real
binary column built from text (the only corpus available), byte
lengths, and deterministic fake "decoded" dimensions derived from the
cross-engine polynomial fingerprint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..functions.hashing import poly_fingerprint, poly_fingerprint_sql
from ..sources import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from the documents corpus: UTF-8 payload
    bytes + typed metadata. Stands in for real image/audio ingest —
    the schema and the binary column are the contract."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def decode_media_stub(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """STUB decode kernel over ``mapInPandas``.

    Real implementation would Pillow-open ``payload`` and emit true
    dimensions + a feature vector; the container lacks the codecs, so
    this derives deterministic fake dimensions from payload bytes.
    The Arrow plumbing — batch iteration, schema projection, output
    cardinality — is exactly what the real kernel uses.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    # deterministic fake: dims from byte length
                    "width": (64 + n_bytes % 512).astype("int32"),
                    "height": (64 + (n_bytes // 7) % 512).astype("int32"),
                    "n_bytes": n_bytes.astype("int64"),
                    "features": [
                        [float(n % 97) / 97.0] * 4 for n in n_bytes
                    ],
                }
            )

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 2) -> DataFrame:
    """STUB frame sampler: one input row → multiple frame rows
    (cardinality-expanding mapInPandas — the video decode shape).
    Frames are fake; the row-explosion plumbing is real."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                blob = payload or b""
                n_frames = max(1, len(blob) // 64)
                for idx in range(0, n_frames, every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(blob[idx * 64 : (idx + 1) * 64])
            yield pd.DataFrame(out)

    return df.mapInPandas(
        sample, schema="media_id long, frame_idx int, frame_bytes binary"
    )


def resize_stub(df: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """STUB resizer: one row in → one row out with new dimensions and
    a proportionally truncated payload (column-transforming
    mapInPandas — the image-resize shape: same cardinality, different
    byte sizes). The byte math is fake; the Arrow batch plumbing,
    schema contract, and deterministic size reduction are real — a
    real kernel drops into the same slot with PIL/OpenCV."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, w, h, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                blob = payload or b""
                src_area = max(1, int(w) * int(h))
                keep = max(1, (len(blob) * target_w * target_h) // src_area)
                out["media_id"].append(mid)
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["payload"].append(blob[: min(len(blob), keep)])
            yield pd.DataFrame(out)

    return df.mapInPandas(
        resize, schema="media_id long, width int, height int, payload binary"
    )


def audio_features_stub(df: DataFrame) -> DataFrame:
    """STUB audio featurizer — raises like a missing codec would, so
    callers exercise their error paths. Clearly marked per the build
    contract."""

    def fail(_batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "audio decode requires an audio library not present in this "
            "container; plug a real kernel into decode_media_stub's slot"
        )

    return df.mapInPandas(fail, schema="media_id long, mfcc array<float>")


# --- the oracle-checked metadata slice --------------------------------------

def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary payload column: byte length (real)
    + deterministic fake decode dims (cross-engine fingerprint
    arithmetic, so the oracle can reproduce them)."""
    m = media_from_documents(spark, sf_dir)
    fp = poly_fingerprint(F.decode(F.col("payload"), "UTF-8"))
    return m.select(
        "media_id",
        F.octet_length(F.decode(F.col("payload"), "UTF-8")).cast("long").alias("n_bytes"),
        (64 + fp % 1024).cast("long").alias("fake_width"),
        # (fp/7) in double is exact here (fp < 2^31 ≪ 2^53); cast
        # truncates = integer div for non-negative values
        (64 + (fp / 7).cast("long") % 1024).cast("long").alias("fake_height"),
        F.col("meta")["lang"].alias("lang"),
    )


MULTIMODAL_META_SQL = f"""
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       64 + {poly_fingerprint_sql('text')} % 1024 AS fake_width,
       64 + ({poly_fingerprint_sql('text')} // 7) % 1024 AS fake_height,
       lang
FROM documents
"""


QUERIES = {
    "multimodal_meta": (multimodal_meta, MULTIMODAL_META_SQL),
}
