"""Streaming TEXT dedup ingest (late r11): the production LLM-corpus
shape — documents arrive continuously, each micro-batch is MinHashed
IN-STREAM and joined stream-static against the persisted corpus band
index, emitting a best-match dup verdict per arriving document. The
text sibling of ``streaming.media_ingest`` and the streaming twin of
``curation.dedup_incremental`` (same split, same verdict semantics,
same oracle).

Streaming-imposed plan shape (each step is streaming-legal):

- **Signatures are PROJECTIONS, not aggregations.** The batch path
  computes MinHash signatures as 16 conditional MINs over exploded
  shingle rows (one shuffle, then the Aggregate doubles as a reuse
  barrier). A streaming aggregation cannot be followed by a join, so
  the stream form computes sig_i = ``array_min(transform(sh, h ->
  (a_i·h + b_i) % p))`` over the per-doc shingle ARRAY — zero
  shuffles, bit-identical values (min over the same distinct-shingle
  set under the same affine maps), at the cost of evaluating the
  higher-order lambdas per row (CodegenFallback — acceptable for
  ingest-rate streams; the batch path keeps the aggregate form).
- **Candidates via LEFT OUTER stream-static band join** (stateless),
  so non-matching arrivals survive to the verdict with −1 sentinels.
- **Verify payload rides the stream.** The batch path dedupes
  candidates and re-fetches both shingle sets via
  ``pair_payload_fetch``; re-fetching the ARRIVAL's own payload in a
  stream would be a stream-stream join (stateful, watermark-bound),
  so the stream form carries the arrival's shingle array through the
  band explode (4 bands — a bounded 4× payload fan-out) and fetches
  only the CORPUS side's set via a second stream-static left join.
- **Argmax via grouped ``max(struct(jaccard, −corpus_id))``** — the
  order-insensitive, incrementally-mergeable form of the batch
  window's (jaccard DESC, corpus_id ASC) ranking; struct ordering is
  lexicographic, so max-of-negated-id breaks ties at min corpus id.

100 TB posture: per micro-batch work is batch-sized explode rows
joined against the persisted band index on short keys (exactly the
batch incremental's join — no corpus×corpus term), both joins
SHUFFLE_HASH-pinned (the r10 corpus-broadcast audit: a corpus-sized
index must never broadcast, and the PAYLOAD index — one shingle-hash
array per corpus doc — is the worst possible broadcast). In
production the two index tables are maintained by the same pipeline
(append verdicts' keepers per batch).

Correctness chain: the declared batch twin ``dedup_text_stream_ingest``
shares this module's exact function over the batch scan and is gated
against ``curation.DEDUP_INCREMENTAL_SQL`` (identical semantics —
split, threshold, tie-break, sentinels); tests/test_streaming.py
drives the REAL readStream (multi-file arrivals, maxFilesPerTrigger=1)
into a memory sink and asserts stream == batch twin == the window-
ranked ``dedup_incremental`` itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import MERSENNE_P, affine_params
from ..operators.curation import _is_new
from ..operators.dedup import (
    BAND_ROWS,
    JACCARD_THRESHOLD,
    NUM_PERM,
    _SHINGLES_FROM_WH,
    _WORD_HASH_EXPR,
    _docs_with_shingles,
    banded_minhash,
    minhash_signatures,
)
from ..sources import load_table
from ..sources.staging import is_staged, staged_path

ARRIVALS_FILES = 4


def arrivals_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "text_arrivals_v1", "documents")


def bands_index_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "text_index_bands_v1", "documents")


def payload_index_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "text_index_payload_v1", "documents")


def stage_text_arrivals(spark: SparkSession, sf_dir: str) -> str:
    """The NEW-batch documents (curation's doc_id % 5 == 4 split) as a
    multi-file parquet directory → several real micro-batches."""
    path = arrivals_path(sf_dir)
    if is_staged(path):
        return path
    load_table(spark, sf_dir, "documents").where(_is_new()).repartition(
        ARRIVALS_FILES, "doc_id"
    ).write.mode("overwrite").parquet(path)
    return path


def stage_text_index(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """The persisted corpus index a production ingest maintains:
    (doc_id, band_idx, band_key) band rows + (doc_id, sh) verify
    payloads, both over the corpus half of the split. Built once via
    the BATCH signature path (the aggregate form — cheaper per doc
    than the stream's projection form, and bit-identical)."""
    bands, payload = bands_index_path(sf_dir), payload_index_path(sf_dir)
    if not is_staged(bands):
        banded_minhash(minhash_signatures(spark, sf_dir)).where(
            ~_is_new()
        ).write.mode("overwrite").parquet(bands)
    if not is_staged(payload):
        _docs_with_shingles(spark, sf_dir).where(~_is_new()).write.mode(
            "overwrite"
        ).parquet(payload)
    return bands, payload


def text_arrivals_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    path = stage_text_arrivals(spark, sf_dir)
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _stream_banded_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, sh, band_idx, band_key) — the projection-only MinHash
    band derivation (see module docstring). Docs with < 3 words get
    NULL band keys (they can match nothing, mirroring the batch path
    where they never enter the signature table)."""
    def _affine_min(a: int, b: int) -> F.Column:
        return F.array_min(
            F.transform(F.col("sh"), lambda h: (h * a + b) % MERSENNE_P)
        )

    sigs = [
        _affine_min(*affine_params(i)).alias(f"sig{i}")
        for i in range(NUM_PERM)
    ]
    n_bands = NUM_PERM // BAND_ROWS
    with_sigs = (
        docs.select("doc_id", F.expr(_WORD_HASH_EXPR).alias("wh"))
        .select("doc_id", F.expr(_SHINGLES_FROM_WH).alias("sh"))
        .select("doc_id", "sh", *sigs)
    )
    band_keys = F.array(
        *[
            F.when(
                F.col("sig0").isNotNull(),
                F.concat_ws(
                    ",",
                    *[F.col(f"sig{b * BAND_ROWS + r}") for r in range(BAND_ROWS)],
                ),
            )
            for b in range(n_bands)
        ]
    )
    return with_sigs.select(
        "doc_id", "sh", F.posexplode_outer(band_keys).alias("band_idx", "band_key")
    )


def text_ingest_dedup_stream(
    docs: DataFrame, index_bands: DataFrame, index_payload: DataFrame
) -> DataFrame:
    """Best corpus match per arriving document: (doc_id, dup_of,
    jaccard, is_dup) with −1/0.0/false sentinels — identical verdict
    semantics to ``curation.dedup_incremental``. ``docs`` may be a
    streaming or batch frame; every operator is streaming-legal."""
    banded = _stream_banded_shingles(docs)
    corpus = index_bands.select(
        F.col("doc_id").alias("corpus_id"), "band_idx", "band_key"
    )
    # stream ⟕ static on band keys, then ⟕ the verify payload:
    # SHUFFLE_HASH-pinned (module docstring — never broadcast a
    # corpus-sized index side)
    cands = banded.hint("shuffle_hash").join(
        corpus, ["band_idx", "band_key"], "left"
    )
    payload = index_payload.select(
        F.col("doc_id").alias("corpus_id"), F.col("sh").alias("sh2")
    )
    fetched = cands.hint("shuffle_hash").join(payload, ["corpus_id"], "left")
    jaccard = (
        F.size(F.array_intersect("sh", "sh2")).cast("double")
        / F.size(F.array_union("sh", "sh2"))
    )
    qualifying = F.when(
        jaccard >= JACCARD_THRESHOLD,
        F.struct(
            jaccard.alias("jaccard"), (-F.col("corpus_id")).alias("neg_id")
        ),
    )
    best = fetched.groupBy("doc_id").agg(F.max(qualifying).alias("best"))
    return best.select(
        "doc_id",
        F.coalesce(-F.col("best.neg_id"), F.lit(-1)).cast("long").alias("dup_of"),
        F.coalesce(F.col("best.jaccard"), F.lit(0.0)).alias("jaccard"),
        F.col("best").isNotNull().alias("is_dup"),
    )


def text_ingest_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """The full streaming operator: arriving documents → in-stream
    MinHash → persisted-index joins → per-doc verdicts."""
    bands, payload = stage_text_index(spark, sf_dir)
    return text_ingest_dedup_stream(
        text_arrivals_stream(spark, sf_dir, max_files_per_trigger),
        spark.read.parquet(bands),
        spark.read.parquet(payload),
    )


# --- index MAINTENANCE (late r11; the text sibling of
# media_ingest's maintenance — same versioned-snapshot commit, same
# replay-stable candidate construction, one marker governing BOTH
# state tables (bands + verify payload) so they flip atomically).

import os as _os

from .snapshots import claim_next, commit, latest_version, version_dir

_BANDS_SCHEMA = "doc_id long, band_idx int, band_key string"
_PAYLOAD_SCHEMA = "doc_id long, sh array<bigint>"

# tests address the version via the module (thin alias; the protocol
# lives in streaming.snapshots, shared with CDC and media ingest)
_latest_version = latest_version


def read_text_index_state(
    spark: SparkSession, state_path: str
) -> tuple[DataFrame, DataFrame]:
    """(bands, payload) of the marker-named snapshot — both tables
    live under ONE version directory so they flip atomically."""
    n = latest_version(state_path)
    if n is None:
        return (
            spark.createDataFrame([], _BANDS_SCHEMA),
            spark.createDataFrame([], _PAYLOAD_SCHEMA),
        )
    base = version_dir(state_path, n)
    return (
        spark.read.parquet(_os.path.join(base, "bands")),
        spark.read.parquet(_os.path.join(base, "payload")),
    )


def seed_text_index_state(
    spark: SparkSession, sf_dir: str, state_path: str
) -> None:
    """Bootstrap from the persisted static index (idempotent)."""
    if latest_version(state_path) is not None:
        return
    bands, payload = stage_text_index(spark, sf_dir)
    _os.makedirs(state_path, exist_ok=True)
    claimed, nxt = claim_next(state_path)
    spark.read.parquet(bands).write.mode("overwrite").parquet(
        _os.path.join(claimed, "bands")
    )
    spark.read.parquet(payload).write.mode("overwrite").parquet(
        _os.path.join(claimed, "payload")
    )
    commit(state_path, nxt)


def apply_text_ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_path: str,
    results_path: str,
) -> None:
    """One exactly-once text-ingest maintenance step. Candidates per
    arriving doc = (index band matches, excluding self-id) ∪
    (within-batch smaller-id band matches); Jaccard-verified against
    the payload union; keepers (no qualifying match) join the next
    snapshot. Replay-idempotent by the same construction as
    ``media_ingest.apply_ingest_batch``, and the same CHAIN SEMANTICS
    contract: within a batch, dup_of may name an earlier arrival that
    is itself a dup — dup_of resolves against (index ∪ results), with
    every chain terminating at a keeper or index doc (within-batch
    edges strictly decrease the id)."""
    from ..functions.barrier import barrier

    banded = barrier(
        _stream_banded_shingles(batch), "corpus", "text ingest batch bands"
    )
    batch_payload = banded.select("doc_id", "sh").dropDuplicates(["doc_id"])
    idx_bands, idx_payload = read_text_index_state(spark, state_path)

    keyed = banded.where(F.col("band_key").isNotNull()).select(
        "doc_id", "band_idx", "band_key"
    )
    # index candidates (exclude self on replay)
    ic = (
        keyed.hint("shuffle_hash")
        .join(
            idx_bands.selectExpr(
                "doc_id AS cand_id", "band_idx", "band_key"
            ),
            ["band_idx", "band_key"],
        )
        .where(F.col("doc_id") != F.col("cand_id"))
    )
    # within-batch smaller-id candidates
    wc = (
        keyed.alias("a")
        .hint("shuffle_hash")
        .join(
            keyed.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("b.doc_id").alias("doc_id"),
            F.col("a.doc_id").alias("cand_id"),
        )
    )
    cands = (
        ic.select("doc_id", "cand_id").unionByName(wc).distinct()
    )
    # verify payloads: candidate sets come from (index ∪ batch) —
    # within-batch candidates resolve through the batch payload,
    # replayed keepers through either (identical arrays)
    payload_all = (
        idx_payload.unionByName(batch_payload).dropDuplicates(["doc_id"])
    )
    fetched = (
        cands.join(batch_payload.selectExpr("doc_id", "sh AS sh1"), "doc_id")
        .hint("shuffle_hash")
        .join(
            payload_all.selectExpr("doc_id AS cand_id", "sh AS sh2"),
            "cand_id",
        )
    )
    jaccard = (
        F.size(F.array_intersect("sh1", "sh2")).cast("double")
        / F.size(F.array_union("sh1", "sh2"))
    )
    best = (
        fetched.select("doc_id", "cand_id", jaccard.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(
                    F.col("jaccard"), (-F.col("cand_id")).alias("neg_id")
                )
            ).alias("best")
        )
    )
    # barrier the verdicts (review finding): three downstream actions
    # (results write, keeper band rows, keeper payload rows) would
    # otherwise each re-execute the whole candidate/verify pipeline
    verdicts = barrier(
        batch.select("doc_id")
        .join(best, ["doc_id"], "left")
        .select(
            "doc_id",
            F.coalesce(-F.col("best.neg_id"), F.lit(-1))
            .cast("long")
            .alias("dup_of"),
            F.coalesce(F.col("best.jaccard"), F.lit(0.0)).alias("jaccard"),
            F.col("best").isNotNull().alias("is_dup"),
        ),
        "corpus",
        "text ingest batch verdicts",
    )
    verdicts.write.mode("overwrite").parquet(
        _os.path.join(results_path, f"batch_id={batch_id}")
    )

    keeper_ids = verdicts.where(~F.col("is_dup")).select("doc_id")
    claimed, nxt = claim_next(state_path)
    next_bands = (
        idx_bands.unionByName(keyed.join(keeper_ids, "doc_id"))
        .dropDuplicates(["doc_id", "band_idx"])
    )
    next_payload = (
        idx_payload.unionByName(batch_payload.join(keeper_ids, "doc_id"))
        .dropDuplicates(["doc_id"])
    )
    next_bands.write.mode("overwrite").parquet(_os.path.join(claimed, "bands"))
    next_payload.write.mode("overwrite").parquet(
        _os.path.join(claimed, "payload")
    )
    commit(state_path, nxt)


def stream_text_ingest_with_maintenance(
    spark: SparkSession,
    sf_dir: str,
    state_path: str,
    results_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
):
    """Checkpointed end-to-end text ingest with index maintenance."""
    seed_text_index_state(spark, sf_dir, state_path)
    stream = text_arrivals_stream(spark, sf_dir, max_files_per_trigger)

    def sink(batch: DataFrame, batch_id: int) -> None:
        apply_text_ingest_batch(
            spark, batch, batch_id, state_path, results_path
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
