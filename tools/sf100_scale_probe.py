"""100× text-corpus scale probe (r12): the flagship text-dedup
family at 1× (sf0.1, 5k docs) vs a 100× decorrelated scale-up
(500k docs) — one decade past the 10× probe (`sf1_scale_probe.py`),
at the corpus size where the adaptive laws (log₂N simhash key
widths, df-capped postings, band geometry) must visibly engage.

The scale-up reuses the 10× build's decorrelation recipe (per-copy
token suffix so cross-copy shingles never collide; doc_id offset by
copy) but set-based — one crossJoin against a copies range instead of
a 100-way union plan — into its own directory, so the cached 10×
scale-up the PRODUCTION_GATES suite uses stays untouched.

What linearity means here: each copy carries the base corpus's
planted near-dup pairs and no cross-copy pairs (disjoint shingle
spaces), so a correct blocked plan returns ~copies× the 1× pair
count in ~copies× the 1× COMPUTE — wall ratios land well under
copies× while overhead amortizes, and pairs/copy stays flat.
``dedup_simhash`` (32-bit) is deliberately NOT probed at 100×: its
measured 10× noise floor (~121k chance pairs at 50k docs) grows with
C(n,2), so its 100× output is noise-dominated by design — the 63-bit
wide form IS the production path past ~10⁵ docs (BASELINE.md
"Wide-simhash threshold frontier").

Usage: python tools/sf100_scale_probe.py [--copies 100] [--reps 2]
[--embeddings]. Default mode probes the text flagships; --embeddings
probes the embedding tier (200k vectors: embedding_dedup,
semdedup_dropped, and the r12 centroid-TABLE k-means fit+assign at
k = n/64). Prints one JSON line: per-query {wall_1x, wall_100x,
ratio, rows_1x, rows_100x, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF100_DIR = os.path.join(REPO, "spark-warehouse", "sf100_scaleup")

LINKED = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings",
)

# text-only flagships: the dedup family + ranked retrieval (all
# blocked/inverted-index plans whose 100 TB posture is the claim
# under test)
QUERIES = (
    "dedup_exact",
    "dedup_containment",
    "dedup_minhash_lsh",
    "dedup_simhash_wide",
    "dedup_ngram_jaccard",
    "docs_line_dedup",
    "dedup_text_stream_ingest",
    "docs_search_bm25",
)


def build_sf100(spark, copies: int) -> str:
    from pyspark.sql import functions as F

    os.makedirs(SF100_DIR, exist_ok=True)
    for t in LINKED:
        link = os.path.join(SF100_DIR, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SF01, f"{t}.parquet"), link)

    docs_path = os.path.join(SF100_DIR, "documents.parquet")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        base = spark.read.parquet(f"{SF01}/documents.parquet")
        n = base.count()
        copies_df = spark.range(copies).withColumnRenamed("id", "k")
        out = (
            base.crossJoin(F.broadcast(copies_df))
            .withColumn("doc_id", F.col("doc_id") + F.col("k") * (10 * n))
            .withColumn(
                "text",
                F.when(F.col("k") == 0, F.col("text")).otherwise(
                    F.regexp_replace(
                        F.col("text"),
                        F.lit(r"(\S+)"),
                        F.concat(F.lit("$1_"), F.col("k").cast("string")),
                    )
                ),
            )
            .withColumn("n_chars", F.length("text"))
            .drop("k")
        )
        out.repartition(64).write.mode("overwrite").parquet(docs_path)
    return SF100_DIR


def build_sf100_embeddings(spark, copies: int) -> str:
    """100× embeddings (200k vectors) via the 10× build's sign-flip
    decorrelation (seeded per-copy random ±1 per dimension — two
    copies sharing a pattern is a 2^-dim event; sign flips preserve
    intra-copy inner products, so each copy keeps the base corpus's
    cluster/near-dup geometry). vec_id offset is 2n per copy — DENSE,
    because embedding_dedup's planted-id guard requires max organic
    id < NEARDUP_ID_OFFSET (the guard fired on a 10n spacing at
    copies=100; that is the guard working, not a probe bug)."""
    import random

    from pyspark.sql import functions as F

    emb_path = os.path.join(SF100_DIR, "embeddings_100x.parquet")
    if os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        return emb_path
    base = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n = base.count()
    dim = len(base.select("embedding").first()[0])
    parts = []
    for k in range(copies):
        c = base.withColumn("vec_id", F.col("vec_id") + F.lit(k * 2 * n))
        if k:
            rng = random.Random(5000 + k)
            signs = [float(rng.choice((-1.0, 1.0))) for _ in range(dim)]
            c = c.withColumn(
                "embedding",
                F.expr(
                    "zip_with(embedding, array("
                    + ",".join(f"{s}F" for s in signs)
                    + "), (x, s) -> x * s)"
                ),
            )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(emb_path)
    return emb_path


def run_embeddings(spark, copies: int, reps: int) -> dict:
    """The embedding tier at 100×: the r12 centroid-TABLE k-means
    path (k = n/64 → 3125 at 200k vectors, a decade past the 10×
    table-assign row) plus the two adaptive-geometry consumers
    (embedding_dedup band bits, SemDeDup's capped-k law — both
    dispatch to the table path above K_LITERAL_MAX)."""
    from robin_sparkles_spark import registry
    from robin_sparkles_spark.operators import clustering as C

    build_sf100(spark, copies)
    emb_100x = build_sf100_embeddings(spark, copies)
    # an sf dir whose embeddings are the 100× table (documents etc.
    # symlinked) so registry queries run unmodified
    emb_dir = os.path.join(SF100_DIR, "embdir")
    os.makedirs(emb_dir, exist_ok=True)
    for t in LINKED + ("documents",):
        link = os.path.join(emb_dir, f"{t}.parquet")
        src = (
            os.path.join(SF01, f"{t}.parquet")
            if t != "embeddings"
            else emb_100x
        )
        if not os.path.exists(link):
            os.symlink(src, link)

    # Per-phase results stream to stderr as they complete and a phase
    # failure (e.g. an OOM in the widest fit) records the error
    # without losing the finished phases — the first run of this mode
    # lost 20 min of completed measurements to an end-of-run print.
    out = {}
    specs = registry.all_queries()
    for name in ("embedding_dedup", "semdedup_dropped"):
        try:
            cells = {}
            for label, sf in (("1x", SF01), (f"{copies}x", emb_dir)):
                walls, rows = [], None
                for rep in range(reps):
                    t0 = time.monotonic()
                    rows = specs[name].fn(spark, sf).count()
                    walls.append(round(time.monotonic() - t0, 3))
                cells[label] = {"wall": min(walls), "rows": rows}
            big = f"{copies}x"
            out[name] = {
                "wall_1x": cells["1x"]["wall"],
                f"wall_{big}": cells[big]["wall"],
                "ratio": round(cells[big]["wall"] / cells["1x"]["wall"], 2),
                "rows_1x": cells["1x"]["rows"],
                f"rows_{big}": cells[big]["rows"],
            }
        except Exception as exc:  # noqa: BLE001 — record, keep probing
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        print(f"PHASE {name}: {json.dumps(out[name])}", file=sys.stderr)

    # the join-form fit+assign itself at k = n/64 (forced table path)
    try:
        vecs = C._vectors(spark, emb_dir)
        n = vecs.count()
        k = max(C.K_CLUSTERS, n // 64)
        t0 = time.monotonic()
        assigned = C.fit_and_assign_table(spark, vecs, k)
        n_assigned = assigned.count()
        out["kmeans_table_assign"] = {
            "n": n,
            "k": k,
            "coarse_k": C._coarse_k_for(k),
            "nprobe": C.ASSIGN_NPROBE,
            "coverage": round(n_assigned / n, 4),
            "wall_sec": round(time.monotonic() - t0, 3),
        }
    except Exception as exc:  # noqa: BLE001
        out["kmeans_table_assign"] = {
            "error": f"{type(exc).__name__}: {exc}"[:300]
        }
    print(
        f"PHASE kmeans_table_assign: {json.dumps(out['kmeans_table_assign'])}",
        file=sys.stderr,
    )
    return out


# new r15 text operators (VERDICT r14 #3/#6 + EXT): per-doc batteries,
# the broadcast blocklist, the LM bucketing, and the composed funnel —
# all claim linear/flat scaling; probed with the same harness.
QUERIES_R15 = (
    "docs_gopher_repetition_flags",
    "docs_url_blocklist_filter",
    "docs_ccnet_perplexity_buckets",
    "curation_funnel",
)


def run(spark, copies: int, reps: int, names: tuple = QUERIES) -> dict:
    from robin_sparkles_spark import registry

    sf100 = build_sf100(spark, copies)
    specs = registry.all_queries()
    out = {}
    walls: dict[str, dict[str, list]] = {}
    for label, sf in (("1x", SF01), (f"{copies}x", sf100)):
        for rep in range(reps):
            for name in names:
                t0 = time.monotonic()
                rows = specs[name].fn(spark, sf).count()
                w = round(time.monotonic() - t0, 3)
                cell = walls.setdefault(name, {}).setdefault(
                    label, {"walls": [], "rows": rows}
                )
                cell["walls"].append(w)
    big = f"{copies}x"
    for name, cells in walls.items():
        w1, wN = min(cells["1x"]["walls"]), min(cells[big]["walls"])
        r1, rN = cells["1x"]["rows"], cells[big]["rows"]
        out[name] = {
            "wall_1x": w1,
            f"wall_{big}": wN,
            "ratio": round(wN / w1, 2),
            "rows_1x": r1,
            f"rows_{big}": rN,
            "rows_per_copy": round(rN / copies, 1),
        }
    return out


def run_stream(spark, copies: int, reps: int) -> dict:
    """The readStream text-ingest drain at the 100× corpus (~100k
    arrivals re-sharded to 40 files) — the sizing rule executed at
    scale: maxFilesPerTrigger=40 (one trigger, per-trigger real work
    ≫ the ~1 s tax) vs 8 (five triggers). The batch twin's 100×
    verdict count (run()) must equal the drained count at every
    trigger slicing."""
    from robin_sparkles_spark.operators.curation import _is_new
    from robin_sparkles_spark.sources import load_table
    from robin_sparkles_spark.streaming.text_ingest import (
        stage_text_index,
        text_ingest_dedup_stream,
    )

    sf100 = build_sf100(spark, copies)
    arrivals = os.path.join(SF100_DIR, "stream_arrivals_100x")
    if not os.path.exists(os.path.join(arrivals, "_SUCCESS")):
        load_table(spark, sf100, "documents").where(_is_new()).repartition(
            40, "doc_id"
        ).write.mode("overwrite").parquet(arrivals)
    bands, payload = stage_text_index(spark, sf100)
    schema = spark.read.parquet(arrivals).schema
    out = {}
    for mfpt in (8, 40):
        walls, rows = [], None
        for rep in range(reps):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", mfpt)
                .parquet(arrivals)
            )
            res = text_ingest_dedup_stream(
                stream,
                spark.read.parquet(bands),
                spark.read.parquet(payload),
            )
            name = f"s100_{mfpt}_{rep}"
            t0 = time.monotonic()
            q = (
                res.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            walls.append(round(time.monotonic() - t0, 3))
            rows = spark.sql(f"SELECT count(*) FROM {name}").first()[0]
        out[f"mfpt_{mfpt}"] = {
            "wall": min(walls),
            "triggers": -(-40 // mfpt),
            "rows": rows,
        }
    return out


def run_stream_media(spark, reps: int) -> dict:
    """The MEDIA twin of ``run_stream`` (VERDICT r13 #4): the
    readStream image-ingest drain at a 100× corpus — 40,000 base
    images (~51k rows with variants) through the real driver-side
    synthesizers, arrivals re-sharded to 400 files, index persisted
    once. Drained at maxFilesPerTrigger 40 (10 triggers) and 400 (one
    trigger); the drained verdict count must equal the batch twin's
    at every slicing (stream==batch one decade past the 10× gate)."""
    import importlib.util

    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators.image_dedup import (
        _img_in_index,
        image_dhash_over,
    )
    from robin_sparkles_spark.streaming.media_ingest import (
        ingest_dedup_stream,
    )

    spec = importlib.util.spec_from_file_location(
        "media_dedup_scale_probe",
        os.path.join(REPO, "tools", "media_dedup_scale_probe.py"),
    )
    probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(probe)
    corpus_path = probe._stage(spark, "image", 40_000)
    corpus = spark.read.parquet(corpus_path)
    n_images = corpus.count()

    arrivals = os.path.join(SF100_DIR, "media_arrivals_100x")
    index = os.path.join(SF100_DIR, "media_index_100x")
    if not os.path.exists(os.path.join(arrivals, "_SUCCESS")):
        corpus.where(~_img_in_index()).repartition(400, "img_id").write.mode(
            "overwrite"
        ).parquet(arrivals)
    if not os.path.exists(os.path.join(index, "_SUCCESS")):
        image_dhash_over(corpus.where(_img_in_index())).repartition(
            8
        ).write.mode("overwrite").parquet(index)

    index_hashes = spark.read.parquet(index)
    schema = spark.read.parquet(arrivals).schema
    out = {}
    # batch twin: the same verdict pipeline over a batch read — the
    # stream==batch reference cell
    t0 = time.monotonic()
    batch = ingest_dedup_stream(
        spark.read.parquet(arrivals), index_hashes, n_images
    )
    batch_rows = batch.count()
    batch_dups = batch.where(F.col("is_dup")).count()
    out["batch_twin"] = {
        "wall": round(time.monotonic() - t0, 3),
        "rows": batch_rows,
        "dups": batch_dups,
    }
    print(f"PHASE batch_twin: {json.dumps(out['batch_twin'])}", file=sys.stderr)

    for mfpt in (40, 400):
        walls, rows, dups = [], None, None
        for rep in range(reps):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", mfpt)
                .parquet(arrivals)
            )
            res = ingest_dedup_stream(stream, index_hashes, n_images)
            name = f"m100_{mfpt}_{rep}"
            t0 = time.monotonic()
            q = (
                res.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            walls.append(round(time.monotonic() - t0, 3))
            rows = spark.sql(f"SELECT count(*) FROM {name}").first()[0]
            dups = spark.sql(
                f"SELECT count(*) FROM {name} WHERE is_dup"
            ).first()[0]
        out[f"mfpt_{mfpt}"] = {
            "wall": min(walls),
            "triggers": -(-400 // mfpt),
            "rows": rows,
            "dups": dups,
            "stream_eq_batch": rows == batch_rows and dups == batch_dups,
        }
        print(
            f"PHASE mfpt_{mfpt}: {json.dumps(out[f'mfpt_{mfpt}'])}",
            file=sys.stderr,
        )
    return out




def _media_probe_tool():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "media_dedup_scale_probe",
        os.path.join(REPO, "tools", "media_dedup_scale_probe.py"),
    )
    probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(probe)
    return probe


def run_stream_audio(spark, reps: int) -> dict:
    """The AUDIO twin of ``run_stream_media`` (VERDICT r13 #5): the
    readStream fingerprint-ingest drain at a 100x corpus - 40,000
    base clips (~51k rows with variants) through the real WAV
    synthesizer, arrivals re-sharded to 400 files, index persisted
    once (multi-file). Drained at maxFilesPerTrigger 40 and 400; the
    drained verdicts must equal the batch twin's at every slicing."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators.audio_dedup import (
        _aud_in_index,
        audio_fingerprints_over,
    )
    from robin_sparkles_spark.streaming.media_ingest import (
        audio_ingest_dedup_stream,
    )

    probe = _media_probe_tool()
    corpus_path = probe._stage(spark, "audio", 40_000)
    corpus = spark.read.parquet(corpus_path)
    n_clips = corpus.count()

    os.makedirs(SF100_DIR, exist_ok=True)
    arrivals = os.path.join(SF100_DIR, "audio_arrivals_100x")
    index = os.path.join(SF100_DIR, "audio_index_100x")
    if not os.path.exists(os.path.join(arrivals, "_SUCCESS")):
        corpus.where(~_aud_in_index()).repartition(400, "aud_id").write.mode(
            "overwrite"
        ).parquet(arrivals)
    if not os.path.exists(os.path.join(index, "_SUCCESS")):
        audio_fingerprints_over(corpus.where(_aud_in_index())).repartition(
            8
        ).write.mode("overwrite").parquet(index)

    index_hashes = spark.read.parquet(index)
    schema = spark.read.parquet(arrivals).schema
    out = {}
    t0 = time.monotonic()
    batch = audio_ingest_dedup_stream(
        spark.read.parquet(arrivals), index_hashes, n_clips
    )
    batch_rows = batch.count()
    batch_dups = batch.where(F.col("is_dup")).count()
    out["batch_twin"] = {
        "wall": round(time.monotonic() - t0, 3),
        "rows": batch_rows,
        "dups": batch_dups,
    }
    print(f"PHASE batch_twin: {json.dumps(out['batch_twin'])}", file=sys.stderr)

    for mfpt in (40, 400):
        walls, rows, dups = [], None, None
        for rep in range(reps):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", mfpt)
                .parquet(arrivals)
            )
            res = audio_ingest_dedup_stream(stream, index_hashes, n_clips)
            name = f"a100_{mfpt}_{rep}"
            t0 = time.monotonic()
            q = (
                res.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            walls.append(round(time.monotonic() - t0, 3))
            rows = spark.sql(f"SELECT count(*) FROM {name}").first()[0]
            dups = spark.sql(
                f"SELECT count(*) FROM {name} WHERE is_dup"
            ).first()[0]
        out[f"mfpt_{mfpt}"] = {
            "wall": min(walls),
            "triggers": -(-400 // mfpt),
            "rows": rows,
            "dups": dups,
            "stream_eq_batch": rows == batch_rows and dups == batch_dups,
        }
        print(
            f"PHASE mfpt_{mfpt}: {json.dumps(out[f'mfpt_{mfpt}'])}",
            file=sys.stderr,
        )
    return out


def _video_verdicts(spark, new_frames, index_frames, counts, widths):
    """The dedup_video_incremental verdict pipeline over explicit
    frame tables with FIXED widths (index-owned, as production would
    key them) - frame pairs -> matched rollup -> half-the-shorter
    rule -> per-new-clip argmax -> sentinel left join."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators.dedup import (
        hamming_blocked_pairs_between,
    )
    from robin_sparkles_spark.operators.video_dedup import (
        FID_STRIDE,
        FRAME_MAX_HAMMING,
    )

    fp = hamming_blocked_pairs_between(
        new_frames,
        index_frames,
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
    c1 = counts.select(
        F.col("vid_id").alias("new_vid"), F.col("n_frames").alias("n1")
    )
    c2 = counts.select(
        F.col("vid_id").alias("index_vid"), F.col("n_frames").alias("n2")
    )
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
    batch = new_frames.select(
        (F.col("fid") / FID_STRIDE).cast("long").alias("vid_id")
    ).distinct()
    return batch.join(best, batch.vid_id == best.new_vid, "left").select(
        "vid_id",
        F.coalesce(F.col("index_vid"), F.lit(-1)).cast("long").alias("dup_of"),
        F.coalesce(F.col("matched_frames"), F.lit(0))
        .cast("long")
        .alias("matched_frames"),
        F.col("index_vid").isNotNull().alias("is_dup"),
    )


def run_video_incremental(spark, reps: int, n_base: int = 30_000) -> dict:
    """The VIDEO incremental path at 100x (VERDICT r13 #5): 30,000
    base clips (100x the fixture's 300) through the real TIFF
    synthesizer. Video's streaming form is the foreachBatch shape
    (two chained aggregations - the documented single-agg streaming
    boundary, video_dedup.py), so the drain is batch-driven: the NEW
    half is applied in 10 slices and in one shot against the SAME
    persisted frame index with index-owned block widths; the union of
    sliced verdicts must equal the one-shot batch (per-clip verdicts
    depend only on clip + index, so slicing is semantics-free - the
    invariance test_media_100x checks through a real readStream)."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.functions.barrier import barrier
    from robin_sparkles_spark.operators.video_dedup import (
        FID_STRIDE,
        _vid_in_index,
        _video_block_widths,
        video_frame_hashes_over,
    )

    probe = _media_probe_tool()
    corpus_path = probe._stage(spark, "video", n_base)
    corpus = spark.read.parquet(corpus_path)

    os.makedirs(SF100_DIR, exist_ok=True)
    frames_path = os.path.join(SF100_DIR, "video_frames_100x")
    if not os.path.exists(os.path.join(frames_path, "_SUCCESS")):
        video_frame_hashes_over(corpus).repartition(32).write.mode(
            "overwrite"
        ).parquet(frames_path)
    frames = spark.read.parquet(frames_path)
    n_frames_total = frames.count()
    widths = _video_block_widths(n_frames_total)
    counts = barrier(
        frames.groupBy("vid_id").agg(F.count(F.lit(1)).alias("n_frames")),
        "vocab",
        "video 100x frame counts",
    )
    index_frames = frames.where(_vid_in_index())
    new_frames = frames.where(~_vid_in_index())

    out = {"n_frames": n_frames_total, "widths": list(widths)}
    t0 = time.monotonic()
    batch = _video_verdicts(spark, new_frames, index_frames, counts, widths)
    batch_rows = batch.count()
    batch_dups = batch.where(F.col("is_dup")).count()
    out["batch"] = {
        "wall": round(time.monotonic() - t0, 3),
        "rows": batch_rows,
        "dups": batch_dups,
    }
    print(f"PHASE batch: {json.dumps(out['batch'])}", file=sys.stderr)

    n_slices = 10
    walls = []
    for rep in range(reps):
        t0 = time.monotonic()
        rows = dups = 0
        for s in range(n_slices):
            sl = new_frames.where(
                (F.col("fid") / FID_STRIDE).cast("long") % n_slices == s
            )
            v = _video_verdicts(spark, sl, index_frames, counts, widths)
            rows += v.count()
            dups += v.where(F.col("is_dup")).count()
        walls.append(round(time.monotonic() - t0, 3))
    out["sliced"] = {
        "wall": min(walls),
        "slices": n_slices,
        "rows": rows,
        "dups": dups,
        "sliced_eq_batch": rows == batch_rows and dups == batch_dups,
    }
    print(f"PHASE sliced: {json.dumps(out['sliced'])}", file=sys.stderr)
    return out


def run_crossmodal_table(spark, reps: int) -> dict:
    """Cross-modal retrieval THROUGH the k > K_LITERAL_MAX table-probe
    dispatch (r15 — VERDICT r14 #7): the module documents
    ``probe_via_table`` as the drop-in above 256 cells but no probe had
    executed that dispatch for this family. Same 100× image corpus
    (200k vectors) and the same staged text queries as the declared
    family; the index is a join-form fit at k = n/256 (781 cells —
    past the literal cap), images assigned via ``assign_via_table``,
    queries probed via ``probe_via_table``, then the identical
    broadcast cell-join + window top-k. Reports paired recall@5 —
    'recall unchanged' means it matches the literal path's 1.0."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators import clustering as C
    from robin_sparkles_spark.operators import crossmodal as X

    build_sf100(spark, 100)
    build_sf100_embeddings(spark, 100)
    emb_dir = os.path.join(SF100_DIR, "embdir")
    base = (
        C._vectors(spark, emb_dir)
        .groupBy("vec_id")
        .agg(F.first("v").alias("v"))
    )
    n = base.count()
    k = max(C.K_CLUSTERS, n // 256)
    assert k > C.K_LITERAL_MAX, (k, C.K_LITERAL_MAX)
    t0 = time.monotonic()
    centroids_df, coarse = C.kmeans_fit_table(spark, base, k)
    imgs = C.assign_via_table(spark, base, centroids_df, coarse)
    q = spark.read.parquet(X.build_crossmodal_queries(spark, emb_dir))
    probes = C.probe_via_table(
        spark,
        q.withColumnRenamed("query_id", "vec_id"),
        centroids_df,
        coarse,
        X.CM_NPROBE,
    ).withColumnRenamed("vec_id", "query_id")
    qp = q.join(probes, "query_id").alias("q")
    c = imgs.alias("c")
    from robin_sparkles_spark.functions.vectors import dot

    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("image_id"))
    topk = (
        F.broadcast(qp)
        .join(c, F.col("q.probe") == F.col("c.cluster"))
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col("c.vec_id").alias("image_id"),
            (
                dot(F.col("q.v"), F.col("c.v"))
                / (
                    F.sqrt(dot(F.col("q.v"), F.col("q.v")))
                    * F.sqrt(dot(F.col("c.v"), F.col("c.v")))
                )
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= X.CM_TOP_K)
    )
    fit_wall = round(time.monotonic() - t0, 2)
    walls, hits, n_q = [], None, q.count()
    for _ in range(reps):
        t0 = time.monotonic()
        hits = topk.where(F.col("image_id") == F.col("query_id")).count()
        walls.append(round(time.monotonic() - t0, 2))
    return {
        "n_vectors": n,
        "k": k,
        "coarse_k": C._coarse_k_for(k),
        "nprobe_cells": X.CM_NPROBE,
        "fit_plus_first_pass_sec": fit_wall,
        "query_wall_min": min(walls),
        "n_queries": n_q,
        "paired_hits": hits,
        "paired_recall_at_5": round(hits / n_q, 4),
    }


def main() -> int:
    copies = (
        int(sys.argv[sys.argv.index("--copies") + 1])
        if "--copies" in sys.argv
        else 100
    )
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2
    if "--embeddings" in sys.argv or "--crossmodal-table" in sys.argv:
        # Production posture for the fit-heavy mode (must precede
        # session creation): corpus barriers stage to parquet instead
        # of the block manager — three phases of block-resident
        # checkpoints starved execution memory and OOMed the widest
        # fit under the 8g default — and the heap gets room for the
        # 25.6M-candidate assign shuffles.
        os.environ.setdefault(
            "SPARK_GRAFT_BARRIER_DIR",
            os.path.join(REPO, "spark-warehouse", "sf100_barrier_stages"),
        )
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from robin_sparkles_spark.session import get_spark

    spark = get_spark(app_name="sf100_scale_probe")
    if "--embeddings" in sys.argv:
        result = run_embeddings(spark, copies, reps)
    elif "--crossmodal-table" in sys.argv:
        result = run_crossmodal_table(spark, reps)
    elif "--stream-media" in sys.argv:
        result = run_stream_media(spark, reps)
    elif "--stream-audio" in sys.argv:
        result = run_stream_audio(spark, reps)
    elif "--video-incremental" in sys.argv:
        result = run_video_incremental(spark, reps)
    elif "--stream" in sys.argv:
        result = run_stream(spark, copies, reps)
    elif "--r15-text" in sys.argv:
        result = run(spark, copies, reps, names=QUERIES_R15)
    else:
        result = run(spark, copies, reps)
    print(json.dumps({"copies": copies, "queries": result}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
