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
    return staged_path(sf_dir, "media_hash_index_v2", "documents")


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


def _index_files(n_rows: int) -> int:
    """≈8k rows per staged index file, capped (the embedding-staging
    file-count law, SCALE.md r12; VERDICT r13 #3 applied it here): a
    ``coalesce(1)`` index is one unsplittable row group, so the
    stream-static join's build side would scan single-task at ANY
    corpus size. The index is corpus-cardinality — file count must
    grow with it."""
    return max(1, min(64, n_rows // 8192))


def stage_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently persist the perceptual-hash index (img_id, dhash)
    over the index half of the corpus — the table a production
    pipeline maintains across ingest batches."""
    path = index_path(sf_dir)
    if is_staged(path):
        return path
    corpus = spark.read.parquet(stage_image_corpus(spark, sf_dir))
    half = corpus.where(_img_in_index())
    image_dhash_over(half).repartition(
        _index_files(half.count())
    ).write.mode("overwrite").parquet(path)
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


def hash_ingest_verdicts(
    arriving_hashes: DataFrame,
    index_hashes: DataFrame,
    widths: tuple[int, ...],
    max_hamming: int,
    *,
    id_col: str,
    hash_col: str,
) -> DataFrame:
    """The generic streaming-legal ingest verdict: best index match
    per arriving hash — (id_col, dup_of, hamming, is_dup), sentinels
    −1/−1/false on no match. Both inputs are (id_col, hash_col)
    frames; the arriving side may be streaming (map, stateless left
    join, grouped min aggregation only). Shared by the image and
    audio ingest paths — any 63-bit fingerprint family plugs in."""
    from ..operators.dedup import _blocked_explode

    _, arriving = _blocked_explode(
        arriving_hashes, widths, max_hamming, id_col, hash_col
    )
    _, idx = _blocked_explode(
        index_hashes, widths, max_hamming, id_col, hash_col
    )
    index = idx.select(
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
        hamming <= max_hamming,
        F.struct(hamming.alias("hamming"), F.col("index_id").alias("index_id")),
    )
    best = joined.groupBy(F.col("doc_id").alias(id_col)).agg(
        F.min(qualifying).alias("best")
    )
    return best.select(
        id_col,
        F.coalesce(F.col("best.index_id"), F.lit(-1)).cast("long").alias("dup_of"),
        F.coalesce(F.col("best.hamming"), F.lit(-1)).cast("long").alias("hamming"),
        F.col("best").isNotNull().alias("is_dup"),
    )


def ingest_dedup_stream(
    media: DataFrame, index_hashes: DataFrame, n_images: int
) -> DataFrame:
    """Best index match per arriving image (the image instantiation of
    :func:`hash_ingest_verdicts`): decode+dHash kernel, then the
    generic verdict pipeline."""
    return hash_ingest_verdicts(
        image_dhash_over(media),
        index_hashes,
        _image_block_widths(n_images),
        IMAGE_MAX_HAMMING,
        id_col="img_id",
        hash_col="dhash",
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


# --- index MAINTENANCE (late r11; SURVEY r12 candidate #3 closed) ------------
#
# The read-only form above answers "is this arrival a dup of the
# EXISTING index"; the full production contract also GROWS the index:
# each micro-batch's novel content must join the index so later
# batches (and later files of the same stream) dedup against it —
# consecutive re-uploads of brand-new content are dups of each other,
# not two independent "new" verdicts. foreachBatch + the CDC module's
# versioned-snapshot pattern (read v(n) → write v(n+1) → atomic marker
# flip; crash/retry debris recovery) make the maintenance exactly-once
# under the same single-writer contract as streaming.cdc.
#
# Replay-idempotence needs one subtlety stated precisely: a replayed
# batch may see an index that ALREADY contains its own keepers (crash
# after marker flip, before checkpoint commit). Verdicts are therefore
# computed over the union of (index matches EXCLUDING self-id) and
# (within-batch smaller-id matches); on replay a keeper matches
# nothing (self excluded, no smaller batch match — it was a keeper)
# and a dup finds the same best candidate through either source, so
# verdicts AND the merged state reach the same fixpoint. The state
# merge itself dedupes by img_id (the hash is deterministic per id),
# and the results sink writes one overwritten subdir per batch id.

import os as _os

from .snapshots import claim_next, commit, latest_version, version_dir

INDEX_SCHEMA = "img_id long, dhash long"

# tests address the version via the module (kept as a thin alias now
# that the protocol lives in streaming.snapshots)
_latest_version = latest_version


def read_index_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Current hash-index snapshot (the marker-named version only)."""
    n = latest_version(state_path)
    if n is None:
        return spark.createDataFrame([], INDEX_SCHEMA)
    return spark.read.parquet(version_dir(state_path, n))


def seed_index_state(spark: SparkSession, sf_dir: str, state_path: str) -> None:
    """Bootstrap the maintained index from the persisted static one
    (idempotent — an already-seeded state is left alone)."""
    if latest_version(state_path) is not None:
        return
    _os.makedirs(state_path, exist_ok=True)
    claimed, nxt = claim_next(state_path)
    spark.read.parquet(stage_index(spark, sf_dir)).write.mode(
        "overwrite"
    ).parquet(claimed)
    commit(state_path, nxt)


def _batch_verdicts(
    hashes: DataFrame, index: DataFrame, widths: tuple[int, ...]
) -> DataFrame:
    """(img_id, dup_of, hamming, is_dup) for one micro-batch's hash
    table against the maintained index PLUS earlier (smaller-id)
    members of the same batch — the replay-stable candidate union
    (see the maintenance comment block).

    CHAIN SEMANTICS of dup_of (contract, review-hardened): within a
    batch, dup_of may name an earlier arrival that is ITSELF a dup
    (a ~ b ~ c where a ≁ c: c's verdict names b, and only a joins the
    index). dup_of therefore resolves against (index ∪ this results
    table), not against the index alone — every chain terminates at a
    keeper or an index member because within-batch edges strictly
    decrease the id and index edges terminate immediately (asserted
    end-to-end in pytest). Canonical-replacement consumers follow the
    verdict chain or join the keeper set; the READ-ONLY ingest form
    (``hash_ingest_verdicts``) keeps the simpler dup_of ∈ index
    contract."""
    from ..operators.dedup import (
        hamming_blocked_pairs,
        hamming_blocked_pairs_between,
    )

    idx = hamming_blocked_pairs_between(
        hashes,
        index,
        widths,
        IMAGE_MAX_HAMMING,
        id_col="img_id",
        hash_col="dhash",
        out_cols=("new_id", "cand_id", "hamming"),
    ).where(F.col("new_id") != F.col("cand_id"))
    within = hamming_blocked_pairs(
        hashes,
        widths,
        IMAGE_MAX_HAMMING,
        id_col="img_id",
        hash_col="dhash",
        out_cols=("a", "b", "hamming"),
    ).select(
        F.col("b").alias("new_id"),
        F.col("a").alias("cand_id"),
        "hamming",
    )
    cands = idx.unionByName(within)
    best = cands.groupBy("new_id").agg(
        F.min(F.struct("hamming", "cand_id")).alias("best")
    )
    return hashes.select("img_id").join(
        best, F.col("img_id") == F.col("new_id"), "left"
    ).select(
        "img_id",
        F.coalesce(F.col("best.cand_id"), F.lit(-1)).cast("long").alias("dup_of"),
        F.coalesce(F.col("best.hamming"), F.lit(-1)).cast("long").alias("hamming"),
        F.col("best").isNotNull().alias("is_dup"),
    )


def apply_ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_path: str,
    results_path: str,
    widths: tuple[int, ...],
) -> None:
    """One exactly-once maintenance step: hash the batch, emit
    verdicts (idempotent per-batch-id subdir overwrite), merge the
    keepers into the next index snapshot (idempotent by-id dedup;
    crash/retry debris handling mirrors streaming.cdc.apply_changes,
    single-writer contract and all)."""
    from ..functions.barrier import barrier

    hashes = barrier(
        image_dhash_over(batch), "corpus", "ingest batch hash table"
    )
    index = read_index_state(spark, state_path)
    # barrier the verdicts too (review finding): they feed BOTH the
    # results write and the keeper extraction — unbarriered, the whole
    # candidate-join pipeline re-executed per consumer
    verdicts = barrier(
        _batch_verdicts(hashes, index, widths),
        "corpus",
        "ingest batch verdicts",
    )
    verdicts.write.mode("overwrite").parquet(
        _os.path.join(results_path, f"batch_id={batch_id}")
    )
    keepers = hashes.join(
        verdicts.where(~F.col("is_dup")).select("img_id"), "img_id"
    )
    claimed, nxt = claim_next(state_path)
    merged = (
        index.unionByName(keepers)
        .groupBy("img_id")
        .agg(F.min("dhash").alias("dhash"))
    )
    merged.write.mode("overwrite").parquet(claimed)
    commit(state_path, nxt)


def stream_ingest_with_maintenance(
    spark: SparkSession,
    sf_dir: str,
    state_path: str,
    results_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
):
    """The checkpointed end-to-end query: arrivals file-stream →
    foreachBatch(apply_ingest_batch) with the maintained index seeded
    from the persisted static one. Returns the started query."""
    seed_index_state(spark, sf_dir, state_path)
    n_images = spark.read.parquet(stage_image_corpus(spark, sf_dir)).count()
    widths = _image_block_widths(n_images)
    stream = arrivals_stream(spark, sf_dir, max_files_per_trigger)

    def sink(batch: DataFrame, batch_id: int) -> None:
        apply_ingest_batch(
            spark, batch, batch_id, state_path, results_path, widths
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# --- audio ingest (late r11: the modality matrix completed) -------------------
#
# Same lifecycle as images: arrivals → fingerprint kernel →
# stream-static index join → verdicts, over the generic
# hash_ingest_verdicts (the acoustic fingerprint is a 63-bit hash
# like dHash, so the whole pipeline is a parameter swap).

AUDIO_SCHEMA = "aud_id long, audio_id long, variant int, payload binary"


def audio_arrivals_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "audio_arrivals_v1", "documents")


def audio_index_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "audio_hash_index_v2", "documents")


def stage_audio_arrivals(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.audio_dedup import _aud_in_index, stage_audio_corpus

    path = audio_arrivals_path(sf_dir)
    if is_staged(path):
        return path
    corpus = spark.read.parquet(stage_audio_corpus(spark, sf_dir))
    corpus.where(~_aud_in_index()).repartition(
        ARRIVALS_FILES, "aud_id"
    ).write.mode("overwrite").parquet(path)
    return path


def stage_audio_index(spark: SparkSession, sf_dir: str) -> str:
    from ..operators.audio_dedup import (
        _aud_in_index,
        audio_fingerprints_over,
        stage_audio_corpus,
    )

    path = audio_index_path(sf_dir)
    if is_staged(path):
        return path
    corpus = spark.read.parquet(stage_audio_corpus(spark, sf_dir))
    half = corpus.where(_aud_in_index())
    audio_fingerprints_over(half).repartition(
        _index_files(half.count())  # never coalesce(1) — see _index_files
    ).write.mode("overwrite").parquet(path)
    return path


def audio_arrivals_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    path = stage_audio_arrivals(spark, sf_dir)
    return (
        spark.readStream.schema(AUDIO_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def audio_ingest_dedup_stream(
    media: DataFrame, index_hashes: DataFrame, n_clips: int
) -> DataFrame:
    """The audio instantiation of :func:`hash_ingest_verdicts`."""
    from ..operators.audio_dedup import (
        AUDIO_MAX_HAMMING,
        _audio_block_widths,
        audio_fingerprints_over,
    )

    return hash_ingest_verdicts(
        audio_fingerprints_over(media),
        index_hashes,
        _audio_block_widths(n_clips),
        AUDIO_MAX_HAMMING,
        id_col="aud_id",
        hash_col="fp",
    )


def audio_ingest_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    from ..operators.audio_dedup import stage_audio_corpus

    n_clips = spark.read.parquet(stage_audio_corpus(spark, sf_dir)).count()
    index = spark.read.parquet(stage_audio_index(spark, sf_dir))
    return audio_ingest_dedup_stream(
        audio_arrivals_stream(spark, sf_dir, max_files_per_trigger),
        index,
        n_clips,
    )
