"""Streaming media ingest dedup (r11; SURVEY round-12 candidate #3).

The ingest shape a production media pipeline runs CONTINUOUSLY:
arriving image payloads land as files, each micro-batch is decoded and
perceptually hashed with the SAME Arrow-batched dHash kernel the batch
operator ships (``image_dedup.image_dhash_over`` — ``mapInPandas`` is
stream-transparent), then joined stream-static against the PERSISTED
perceptual-hash index and reduced to a best-match verdict per arriving
image. This is the missing bridge between the §2.9 streaming surface
and the media-dedup family: ``dedup_image_incremental`` answers
"today's batch vs the index" as a batch job; this operator answers it
as a `readStream`.

Streaming-imposed plan shape (and why it differs from the batch twin):

- The batch incremental ranks matches with a ``row_number`` window —
  unsupported over unbounded streams. The streaming form uses a
  GROUPED AGGREGATION instead: ``min(struct(hamming, index_id))`` is
  the same argmin with the same (hamming, then index_id) tie-break,
  expressed as an order-insensitive, incrementally-mergeable aggregate
  — exactly the shape Structured Streaming's state store maintains.
- The pigeonhole candidate join keeps every arriving image via a LEFT
  OUTER stream-static join (stream left ⟕ static is stateless and
  supported); non-matching images surface as NULL candidates and
  reduce to the −1 sentinels. No stream-stream join, no watermark
  needed: the static side is a finite index.
- No canonical-subset filter (``dedup._canonical_verified``): a pair
  matching on several clean subsets yields duplicate candidate rows,
  which the min() collapses for free — the aggregation IS the dedupe.

100 TB posture: per micro-batch work is (batch × C(m,m−k)) explode
rows joined against the exploded index on short keys — the exact
incremental-join scale posture measured for the batch twin (only the
arrivals and the index explode; no corpus×corpus term). The join is
SHUFFLE_HASH-pinned (the r10 corpus-broadcast audit: post-explode size
estimates are blind to the fan-out, and an index-sized broadcast OOMs
the driver at real corpus counts). In production the exploded index
would be a persisted table maintained by the same pipeline (append new
keepers per batch); here it is derived from the staged index parquet
per trigger, which at fixture scale is the same cost.

Correctness chain: the declared batch twin ``dedup_image_stream_ingest``
is DuckDB-oracle-gated (same closed-form dHash oracle as the
incremental operator — the semantics are identical, the plan is the
streaming-legal one), and tests/test_streaming.py drives the REAL
``readStream`` (multi-file arrivals dir, ``maxFilesPerTrigger=1`` → 4+
micro-batches) into a memory sink and asserts stream output == batch
twin, so the streaming operator is transitively oracle-checked — the
same parity contract every §2.9 operator ships under.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.image_dedup import (
    IMAGE_MAX_HAMMING,
    _image_block_widths,
    _img_in_index,
    image_dhash_over,
    stage_image_corpus,
)
from ..sources.staging import is_staged, staged_path

ARRIVALS_FILES = 4  # arrivals land as several files → several triggers

MEDIA_SCHEMA = (
    "img_id long, image_id long, variant int, fmt string, payload binary"
)


def arrivals_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "media_arrivals_v1", "documents")


def index_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "media_hash_index_v1", "documents")


def stage_arrivals(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently stage the NEW-batch rows of the image corpus (the
    complement of the persisted index — same arithmetic split as
    ``dedup_image_incremental``) as a multi-file parquet directory, so
    ``maxFilesPerTrigger=1`` exercises several real micro-batches."""
    path = arrivals_path(sf_dir)
    if is_staged(path):
        return path
    corpus = spark.read.parquet(stage_image_corpus(spark, sf_dir))
    corpus.where(~_img_in_index()).repartition(ARRIVALS_FILES, "img_id").write.mode(
        "overwrite"
    ).parquet(path)
    return path


def stage_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently persist the perceptual-hash index (img_id, dhash)
    over the index half of the corpus — the table a production
    pipeline maintains across ingest batches."""
    path = index_path(sf_dir)
    if is_staged(path):
        return path
    corpus = spark.read.parquet(stage_image_corpus(spark, sf_dir))
    image_dhash_over(corpus.where(_img_in_index())).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def arrivals_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """``readStream`` over the staged arrivals directory (explicit
    schema — streaming file sources don't infer)."""
    path = stage_arrivals(spark, sf_dir)
    return (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _exploded(hashes: DataFrame, widths: tuple[int, ...]) -> DataFrame:
    """Pigeonhole band-key explode (the shared ``dedup`` machinery) —
    (doc_id, simhash, key_idx, key) rows."""
    from ..operators.dedup import _blocked_explode

    _, blocked = _blocked_explode(
        hashes, widths, IMAGE_MAX_HAMMING, "img_id", "dhash"
    )
    return blocked


def ingest_dedup_stream(
    media: DataFrame, index_hashes: DataFrame, n_images: int
) -> DataFrame:
    """Best index match per arriving image: (img_id, dup_of, hamming,
    is_dup), sentinels −1/−1/false when nothing in the index is within
    Hamming ≤ 6. ``media`` may be a streaming OR batch frame — every
    operator here is streaming-legal (map, stateless left join,
    grouped min aggregation); the batch twin is this exact function
    applied to the batch scan."""
    widths = _image_block_widths(n_images)
    arriving = _exploded(image_dhash_over(media), widths)
    index = _exploded(index_hashes, widths).select(
        F.col("doc_id").alias("index_id"),
        F.col("simhash").alias("index_hash"),
        "key_idx",
        "key",
    )
    # Stream ⟕ static on the band keys; SHUFFLE_HASH-pinned (see
    # module docstring — an exploded-index broadcast is the r10 OOM).
    joined = arriving.hint("shuffle_hash").join(
        index, ["key_idx", "key"], "left"
    )
    hamming = F.bit_count(
        F.col("simhash").bitwiseXOR(F.col("index_hash"))
    ).cast("long")
    qualifying = F.when(
        hamming <= IMAGE_MAX_HAMMING,
        F.struct(hamming.alias("hamming"), F.col("index_id").alias("index_id")),
    )
    best = joined.groupBy(F.col("doc_id").alias("img_id")).agg(
        F.min(qualifying).alias("best")
    )
    return best.select(
        "img_id",
        F.coalesce(F.col("best.index_id"), F.lit(-1)).cast("long").alias("dup_of"),
        F.coalesce(F.col("best.hamming"), F.lit(-1)).cast("long").alias("hamming"),
        F.col("best").isNotNull().alias("is_dup"),
    )


def media_ingest_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """The full streaming operator: arriving payloads → dHash kernel →
    stream-static index join → per-image verdicts."""
    n_images = spark.read.parquet(stage_image_corpus(spark, sf_dir)).count()
    index = spark.read.parquet(stage_index(spark, sf_dir))
    return ingest_dedup_stream(
        arrivals_stream(spark, sf_dir, max_files_per_trigger), index, n_images
    )
