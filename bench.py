#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock over the headline set; per-query times in
``queries``. Each query is executed with a count() action (forces the
full plan, returns only a scalar to the driver).

Noise model (r5, VERDICT r4 ask #3): two consecutive rounds were judged
"probably host noise" because a single pass on this host spreads
25.9-42.7 s for identical code (BASELINE.md). The headline set now runs
``SPARK_GRAFT_BENCH_REPS`` (default 3) INTERLEAVED repetitions in one
session — rep 1 all queries, rep 2 all queries, … — so a host-load
burst hits all queries equally instead of biasing whichever query it
lands on. ``queries``/``value`` carry the per-query MEDIAN (the
round-over-round comparable), ``queries_min``/``min_value`` the
per-query MIN (the least-noise floor), ``first_pass_value`` the rep-1
single-pass total (comparable to BENCH_r01–r04).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

# Headline queries (subset of the registry that spans the operator
# families; extended as phases land). Scale rule (VERDICT r01 ask #4):
# every headline plan is linear-shuffle shaped — the O(N²)/O(Q·N)
# brute-force baselines live in pytest only and are never benchmarked.
# dedup_simhash and dedup_ngram_jaccard stay headline because round 2
# rebuilt them as blocked equi-joins (pigeonhole chunks / inverted
# index); ann_bruteforce_topk was replaced by the LSH twin + the new
# bucketed embedding_similar_pairs.
HEADLINE = [
    "wordcount_stopword",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_customers_revenue",
    "order_lineitem_rollup",
    "window_running_user_spend",
    "events_user_stats",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    # r13 (VERDICT r12 ask #6): the retired quadratic-banding
    # diagnostic embedding_similar_pairs is replaced by the PRODUCTION
    # learned-cell form — the headline now benches only
    # registry-declared queries. Re-anchor recorded in BASELINE.md
    # ("Headline re-anchor, r13"): headline totals before/after the
    # swap are both recorded there, so round-over-round comparability
    # survives the member change.
    "embedding_similar_pairs_ivf",
    "ann_lsh_topk",
    "events_tumbling_1h",
    "user_sessions",
    "text_top_terms",
    "orders_asof_last_event",
]


# Heavy / newer families, timed in a SEPARATE key so the headline
# total stays comparable to BENCH_r01–r06, but — r7 (VERDICT r6 ask
# #1) — now run with the SAME N≥3 interleaved-median protocol as the
# headline set (the single-pass "extended_r5" key is retired): their
# regressions are judgeable round-over-round from BENCH_r07 on. Same
# linear-shuffle rule. One-time model/corpus staging (k-means fit,
# planted-dup corpus, BPE merge fit) is timed separately as
# model_staging_sec so rep-1 doesn't charge it to whichever consumer
# runs first.
EXTENDED = [
    "events_funnel_conversion",
    "user_retention_cohorts",
    "docs_chunked_context",
    "docs_chunk_dedup",
    "docs_rarity_topk",
    "semdedup_dropped",
    "orders_bloom_prune",
    "lineitem_zorder_stats",
    "orders_upsert_latest",
    "referential_integrity_audit",
    "column_profile",
    "docs_search_and",
    "events_spend_alerts",
    # promoted r7: previously un-benched heavy families
    "bpe_merge_training",
    "embedding_gram_matrix",
    "png_decode_stats",
    # new r7 queries (share the staged fits/fixtures above)
    "ann_ivf_recall_at_k",
    "bpe_fertility_by_lang",
    "orders_custkey_hll",
    "users_hll_by_type",
    "mp4_box_stats",
    "mp3_frame_stats",
    "jpeg_marker_stats",
    "jpeg_entropy_stats",
    "warc_record_stats",
    "zip_members_stats",
    "tar_archive_stats",
    "html_extract_text",
    "url_normalize_stats",
    "tfrecord_stats",
    # new r8 queries (gzip-framed WARC + member explosion, pixel IDCT)
    "warc_gzip_stats",
    "warc_gz_member_stats",
    "jpeg_pixel_stats",
    # new r9 queries (progressive decode; PQ/IVFPQ ANN over the shared
    # fits; n-gram LM/backoff/span scoring; BM25; overlap; resize +
    # frame features; keeper selection)
    "jpeg_progressive_pixel_stats",
    "jpeg_progressive_sa_stats",
    "pq_encode",
    "pq_rerank_topk",
    "ann_ivfpq_topk",
    "ngram_lm_score",
    "ngram_backoff_score",
    "ngram_repeated_spans",
    "docs_search_bm25",
    "source_overlap_matrix",
    "bmp_resize_stats",
    "wav_frame_features",
    "dedup_canonical_keepers",
    # new r10 queries (full-block zstd walk over real libzstd frames;
    # maximal repeated spans; OPQ recall over the shared rotated fit)
    "warc_zstd_deep_stats",
    "ngram_maximal_spans",
    "opq_recall_at_k",
    # new r11 queries (real-pixel dHash / PCM frame-energy fingerprint
    # / per-frame TIFF dHash + the shared pigeonhole-blocked hamming
    # join, frame-level for video)
    "dedup_image_phash",
    "dedup_audio_fingerprint",
    "dedup_video_phash",
    # new r11: Lee-et-al. repeated-span removal (the surgery half of
    # the r10 detector) and the image-text pair retention composition
    "docs_scrub_repeated_spans",
    "image_text_pair_curation",
    # new r11: media groups→keepers (fidelity policy) + the
    # incremental batch-vs-index image dedup
    "audio_dedup_keepers",
    "video_dedup_keepers",
    "dedup_image_incremental",
    "dedup_video_phash_strided",
    # new r11: exact-integer water-filling budget allocation
    "source_waterfill_allocation",
    # late r11: streaming-ingest batch twins (stream-legal agg plans),
    # the 63-bit wide simhash (32-bit noise-floor fix), and the
    # JSONL/CSV ingest round-trips
    "dedup_image_stream_ingest",
    "dedup_text_stream_ingest",
    "dedup_simhash_wide",
    "jsonl_ingest_stats",
    "csv_ingest_stats",
    "docs_epoch_shuffle",
    # late r11: the modality ingest matrix completed (audio
    # incremental + stream twin; video incremental — frame rollup)
    "dedup_audio_incremental",
    "dedup_audio_stream_ingest",
    "dedup_video_incremental",
    # late r11: hashed-linear quality-classifier inference
    "quality_classifier_score",
    # new r14: cross-modal retrieval (text query → image ANN over the
    # shared memoized IVF fit) + its declared recall gate, and the
    # Gopher-style per-domain document cap
    "crossmodal_text_image_topk",
    "crossmodal_paired_recall",
    "docs_domain_capped_sample",
    "docs_gopher_quality_flags",
    # new r13: embedded-document (containment) dedup + C4-style
    # cross-document line dedup
    "dedup_containment",
    "docs_line_dedup",
    # new r15: the Gopher repetition battery, the UT1 blocklist
    # filter, CCNet perplexity buckets, and the FineWeb survival
    # funnel (which composes blocklist + both Gopher batteries +
    # exact/near dedup, so it amortizes their staged fixtures)
    "docs_gopher_repetition_flags",
    "docs_url_blocklist_filter",
    "docs_ccnet_perplexity_buckets",
    "curation_funnel",
    "decontaminate_semantic",
    "docs_c4_line_filters",
]


# Host-speed anchor for the noise reference workload (see
# _noise_ref_sec): the r13 closing-bench median (local[32], median of
# 3 reps: [1.33, 0.94, 1.06]). A round whose noise_ref median sits
# well above this says "loaded host" — the whole draw is
# proportionally inflated — without having to re-run r-minus-1 code
# (VERDICT r12 ask #7: the r12 bench read 1.39× on every query
# including constant-work ones; this field makes that diagnosis a
# recorded number, not archaeology). Calibration note: the r13 close
# ran on a moderately contended box (headline 22.1 s vs r12's quiet
# 15.9), so the anchor errs HIGH — quiet rounds should read
# vs_anchor < 1, loaded ones ≫ 1.
NOISE_REF_ANCHOR_SEC = 1.06


def _noise_ref_sec(spark) -> float:
    """Fixed, CODE-INDEPENDENT reference workload — one codegen'd
    scan-agg over spark.range and one 1000-key shuffle. It exercises
    the same resources the bench queries contend for (CPU, shuffle,
    scheduler) but touches no repo code or data, so its wall time
    moves with host load only. Interleaved once per rep like any
    other query."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    spark.range(50_000_000).select(F.sum(F.col("id") * 2)).collect()
    (
        spark.range(5_000_000)
        .groupBy((F.col("id") % 1000).alias("k"))
        .count()
        .select(F.sum("count"))
        .collect()
    )
    return round(time.perf_counter() - t0, 4)


def _parse_sf(sf_dir: str) -> float | str:
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return float(sf) if sf.replace(".", "").isdigit() else sf


def _run_set(spark, specs, sf_dir: str, names=None) -> dict[str, float]:
    times: dict[str, float] = {}
    for name in (n for n in (names or HEADLINE) if n in specs):
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 4)
    return times


def _compaction_check(spark, sf_dir: str, n_small_files: int = 256) -> dict:
    """Quantify the lake-maintenance claim (SCALE.md / VERDICT r03
    ask #9): stage the documents table as many tiny files (the layout
    streaming sinks and per-run partition writes accumulate), scan it,
    compact with sinks.compact_parquet, scan again. At 100 TB the
    fragmented penalty is file-open + footer overhead × millions of
    files; at this scale it is already measurable. Reported separately
    from the headline total so round-over-round comparability holds."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from robin_sparkles_spark.sources.sinks import compact_parquet

    base = tempfile.mkdtemp(prefix="bench_compaction_")
    frag, comp = os.path.join(base, "frag"), os.path.join(base, "comp")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(n_small_files).write.mode("overwrite").parquet(frag)

    def scan_sec(path: str) -> float:
        t0 = time.perf_counter()
        (
            spark.read.parquet(path)
            .groupBy("lang")
            .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
            .collect()
        )
        return time.perf_counter() - t0

    frag_sec = min(scan_sec(frag) for _ in range(3))
    n_compacted = compact_parquet(spark, frag, comp, target_file_mb=128)
    comp_sec = min(scan_sec(comp) for _ in range(3))
    shutil.rmtree(base, ignore_errors=True)
    return {
        "fragmented_files": n_small_files,
        "compacted_files": n_compacted,
        "fragmented_scan_sec": round(frag_sec, 4),
        "compacted_scan_sec": round(comp_sec, 4),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Second, smaller scale factor: per-query ratios between the two
    # SFs expose super-linear plans round-over-round (a linear-shuffle
    # query scales ~data size; a quadratic one scales ~size²). Set
    # SPARK_GRAFT_SCALE_CHECK_DIR="" to skip.
    scale_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_CHECK_DIR", "/root/testdata/sf0.01"
    )
    from robin_sparkles_spark.session import get_spark
    from robin_sparkles_spark import registry

    spark = get_spark(app_name="robin_sparkles_bench")
    specs = dict(registry.all_queries())
    names = [n for n in HEADLINE if n in specs]

    # Warm the JVM + parquet footer caches once so per-query numbers
    # measure the query, not session startup.
    specs[names[0]].fn(spark, sf_dir).count()

    # Shared model/corpus staging (k-means fit, planted-dup corpus,
    # BPE merge fit), timed SEPARATELY and BEFORE the reps: the
    # consumers (kmeans_assign / ann_ivf_topk / semdedup_dropped /
    # bpe_merge_training) share memoized fits, so charging staging to
    # whichever runs first misattributes ~15 s of one-time cost as
    # that query's per-run cost (r5: semdedup_dropped read as 18 s
    # when its steady-state scan is ~5 s).
    t0 = time.perf_counter()
    from robin_sparkles_spark.operators import bpe
    from robin_sparkles_spark.operators.clustering import kmeans_fit
    from robin_sparkles_spark.operators.embedding_dedup import build_neardup_corpus

    from robin_sparkles_spark.operators.similarity import build_exact_topk

    kmeans_fit(spark, sf_dir)
    build_neardup_corpus(spark, sf_dir)
    bpe._fit_merges(spark, sf_dir)
    build_exact_topk(spark, sf_dir)  # ANN ground-truth fixture (disk-memoized)
    # r9: PQ codebooks + IVFPQ coarse quantizer (memoized per sf_dir —
    # consumers pq_encode/pq_rerank_topk/ann_ivfpq_topk share them)
    from robin_sparkles_spark.operators.pq import coarse_fit, pq_fit

    pq_fit(spark, sf_dir)
    coarse_fit(spark, sf_dir)
    # r10: OPQ rotation + rotated-index codebooks (memoized; consumer
    # opq_recall_at_k), and the real-zstd staged corpus
    from robin_sparkles_spark.operators.archive_parse import (
        stage_warc_zst_real_corpus,
    )
    from robin_sparkles_spark.operators.opq import _opq_books, opq_fit

    opq_fit(spark, sf_dir)
    _opq_books(spark, sf_dir)
    stage_warc_zst_real_corpus(spark, sf_dir)
    # r11: the planted image/audio corpora (driver-side synthesis)
    from robin_sparkles_spark.operators.audio_dedup import stage_audio_corpus
    from robin_sparkles_spark.operators.image_dedup import stage_image_corpus
    from robin_sparkles_spark.operators.video_dedup import (
        stage_video_dedup_corpus,
    )

    stage_image_corpus(spark, sf_dir)
    stage_audio_corpus(spark, sf_dir)
    stage_video_dedup_corpus(spark, sf_dir)
    staging_sec = round(time.perf_counter() - t0, 4)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    ext_names = [n for n in EXTENDED if n in specs]
    both = names + ext_names
    passes, noise_reps = [], []
    for _ in range(reps):
        noise_reps.append(_noise_ref_sec(spark))
        passes.append(_run_set(spark, specs, sf_dir, both))
    med = {n: round(statistics.median(p[n] for p in passes), 4) for n in names}
    low = {n: round(min(p[n] for p in passes), 4) for n in names}
    noise_med = round(statistics.median(noise_reps), 4)
    payload = {
        "metric": "headline_queries_wall_clock",
        "value": round(sum(med.values()), 4),
        "unit": "sec",
        "reps": reps,
        "queries": med,
        "queries_min": low,
        "min_value": round(sum(low.values()), 4),
        "first_pass_value": round(sum(passes[0][n] for n in names), 4),
        "sf": _parse_sf(sf_dir),
        # host-load self-label (VERDICT r12 ask #7): vs_anchor ≫ 1
        # says this draw ran on a loaded host and the query walls are
        # proportionally inflated — read the round's numbers with that
        # multiplier in mind before calling anything a regression.
        "noise_ref": {
            "per_rep": noise_reps,
            "median_sec": noise_med,
            "min_sec": round(min(noise_reps), 4),
            "anchor_sec": NOISE_REF_ANCHOR_SEC,
            "vs_anchor": round(noise_med / NOISE_REF_ANCHOR_SEC, 3),
        },
    }
    ext_med = {
        n: round(statistics.median(p[n] for p in passes), 4) for n in ext_names
    }
    ext_low = {n: round(min(p[n] for p in passes), 4) for n in ext_names}
    # Per-family subtotals (VERDICT r12 ask #8): the extended set grew
    # ~8 queries/round, so a single extended_value hides WHERE a
    # regression lives. Families come from registry.by_family() (the
    # module grouping the README table uses), so attribution can't
    # drift from the registry itself.
    fam_subtotals = {}
    for family, members in registry.by_family().items():
        tot = sum(ext_med[n] for n in members if n in ext_med)
        if tot:
            fam_subtotals[family] = round(tot, 4)
    payload["extended"] = {
        "value": round(sum(ext_med.values()), 4),
        "min_value": round(sum(ext_low.values()), 4),
        "model_staging_sec": staging_sec,
        "family_subtotals": fam_subtotals,
        "queries": ext_med,
        "queries_min": ext_low,
    }
    if scale_dir and os.path.isdir(scale_dir) and scale_dir != sf_dir:
        # r15 measurement-methodology fix (guide §1; documented in
        # OPTIMIZATION_r15.md): the headline above excludes one-time
        # model staging (model_staging_sec), but the scale check ran
        # COLD — the scale-SF k-means fit was charged to whichever
        # consumer ran first (embedding_similar_pairs_ivf read 8.1 s
        # of a 20.5 s sf0.01 check; r14's 7.0 s reading carried the
        # same term). The fit is now staged and timed separately, and
        # value_with_staging preserves the old-methodology composite
        # so BENCH_r01–r14 scale_check values stay readable.
        from robin_sparkles_spark.operators.clustering import _embeddings_k

        t1 = time.perf_counter()
        kmeans_fit(spark, scale_dir, k=_embeddings_k(spark, scale_dir))
        scale_staging = round(time.perf_counter() - t1, 4)
        small = _run_set(spark, specs, scale_dir)
        payload["scale_check"] = {
            "sf": _parse_sf(scale_dir),
            "value": round(sum(small.values()), 4),
            "model_staging_sec": scale_staging,
            "value_with_staging": round(
                sum(small.values()) + scale_staging, 4
            ),
            "queries": small,
        }
    # Set SPARK_GRAFT_COMPACTION_CHECK to "", "0", or "false" to skip.
    if os.environ.get("SPARK_GRAFT_COMPACTION_CHECK", "1").lower() not in (
        "",
        "0",
        "false",
    ):
        payload["compaction"] = _compaction_check(spark, sf_dir)
    # r11 (VERDICT r10 ask #1): the driver keeps only a 2,000-char tail
    # of stdout and parses the LAST JSON line — the full payload grew to
    # ~5 KB by r5 and the headline value has been truncated away
    # (BENCH_r05–r10 all record "parsed": null). Emit the full detail
    # first (own line + a sidecar file for humans), then a compact
    # summary object LAST that is guaranteed to fit the tail.
    detail = json.dumps(payload)
    print(detail)
    try:
        with open(os.path.join(REPO_ROOT, "bench_detail.json"), "w") as fh:
            fh.write(detail + "\n")
    except OSError:
        pass  # read-only checkout: stdout detail line still has it all
    summary = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "sf": payload["sf"],
        "reps": payload["reps"],
        "n_queries": len(med),
        "min_value": payload["min_value"],
        "first_pass_value": payload["first_pass_value"],
        "extended_value": payload["extended"]["value"],
        "extended_min_value": payload["extended"]["min_value"],
        "noise_ref": payload["noise_ref"],
        "queries": med,
        "detail": "bench_detail.json",
    }
    line = json.dumps(summary)
    if len(line) > 1800:  # belt-and-braces: never exceed the tail again
        summary.pop("queries")
        line = json.dumps(summary)
    print(line)


if __name__ == "__main__":
    main()
