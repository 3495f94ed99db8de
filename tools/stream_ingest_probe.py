"""Micro-batch overhead probe for BOTH streaming ingest paths (late
r11 image path; text path added r12 per VERDICT r11 ask #5): the same
arrival corpus drained through the read-only ingest stream at
different ``maxFilesPerTrigger`` settings — 1 file/trigger (many
micro-batches, maximum per-batch overhead) vs all files in one
trigger (the batch limit). The delta IS the micro-batch tax:
per-trigger planning + state commit + the per-batch hash/index-join
fixed costs.

Two corpus sizes per path, so the tax is measured both where it
dominates and where real work amortizes it:
- image: fixture corpus (400 base images, 4 arrival files) vs the
  10× synthetic probe corpus (4000 images, 40 arrival files);
- text: fixture documents (sf0.01, 500 docs → ~100 arrivals in 4
  files) vs the real 10× table (sf0.1, 5000 docs → ~1000 arrivals
  re-sharded to 40 files), index staged per-sf by the shipped
  ``stage_text_index``.

Usage: python tools/stream_ingest_probe.py [--reps 2]
Prints one JSON line {"image": {"fixture": {...}, "10x": {...}},
"text": {...}} with per-setting wall seconds (min over reps), the
trigger count, and the drained row count.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, "spark-warehouse", "stream_ingest_probe")


def _stage_10x(spark):
    """Arrivals (40 files) + index hashes for the 4000-image probe
    corpus (reuses media_dedup_scale_probe's staged synthesis)."""
    import importlib.util

    from robin_sparkles_spark.operators.image_dedup import (
        _img_in_index,
        image_dhash_over,
    )

    spec = importlib.util.spec_from_file_location(
        "media_dedup_scale_probe",
        os.path.join(REPO, "tools", "media_dedup_scale_probe.py"),
    )
    probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(probe)
    corpus_path = probe._stage(spark, "image", 4000)

    arrivals = os.path.join(OUT_DIR, "arrivals_10x")
    index = os.path.join(OUT_DIR, "index_10x")
    # the SHIPPED split expression — a hand copy here would silently
    # diverge if the fixture split changes again (review finding)
    in_index = _img_in_index()
    corpus = spark.read.parquet(corpus_path)
    if not os.path.exists(os.path.join(arrivals, "_SUCCESS")):
        corpus.where(~in_index).repartition(40, "img_id").write.mode(
            "overwrite"
        ).parquet(arrivals)
    if not os.path.exists(os.path.join(index, "_SUCCESS")):
        image_dhash_over(corpus.where(in_index)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(index)
    return arrivals, index


def _drain(spark, arrivals: str, index_path: str, mfpt: int, name: str):
    from robin_sparkles_spark.operators.image_dedup import (
        _image_block_widths,
    )
    from robin_sparkles_spark.streaming.media_ingest import (
        MEDIA_SCHEMA,
        ingest_dedup_stream,
    )

    index = spark.read.parquet(index_path)
    n_images = spark.read.parquet(arrivals).count() + index.count()
    stream = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", mfpt)
        .parquet(arrivals)
    )
    out = ingest_dedup_stream(stream, index, n_images)
    t0 = time.monotonic()
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    rows = spark.sql(f"SELECT count(*) FROM {name}").first()[0]
    return wall, rows


TEXT_10X_SF = "/root/testdata/sf0.1"


def _stage_text_10x(spark):
    """Text arrivals for the real 10× table (sf0.1), re-sharded to 40
    files so the per-file drain has 40 triggers; index staged by the
    SHIPPED per-sf staging (bands + verify payload)."""
    from robin_sparkles_spark.operators.curation import _is_new
    from robin_sparkles_spark.sources import load_table
    from robin_sparkles_spark.streaming.text_ingest import stage_text_index

    arrivals = os.path.join(OUT_DIR, "text_arrivals_10x")
    if not os.path.exists(os.path.join(arrivals, "_SUCCESS")):
        load_table(spark, TEXT_10X_SF, "documents").where(
            _is_new()
        ).repartition(40, "doc_id").write.mode("overwrite").parquet(arrivals)
    bands, payload = stage_text_index(spark, TEXT_10X_SF)
    return arrivals, bands, payload


def _drain_text(
    spark, arrivals: str, bands: str, payload: str, mfpt: int, name: str
):
    from robin_sparkles_spark.streaming.text_ingest import (
        text_ingest_dedup_stream,
    )

    schema = spark.read.parquet(arrivals).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", mfpt)
        .parquet(arrivals)
    )
    out = text_ingest_dedup_stream(
        stream,
        spark.read.parquet(bands),
        spark.read.parquet(payload),
    )
    t0 = time.monotonic()
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    rows = spark.sql(f"SELECT count(*) FROM {name}").first()[0]
    return wall, rows


def _measure(arrivals, settings, reps, label, drain_one):
    """min-over-reps wall per maxFilesPerTrigger setting."""
    row = {}
    for mfpt in settings:
        best, rows = None, None
        for r in range(reps):
            wall, rows = drain_one(mfpt, f"p_{label}_{mfpt}_{r}")
            best = wall if best is None else min(best, wall)
        n_files = len(
            [f for f in os.listdir(arrivals) if f.endswith(".parquet")]
        )
        row[f"mfpt_{mfpt}"] = {
            "wall": round(best, 3),
            "triggers": -(-n_files // mfpt),
            "rows": rows,
        }
    return row


def run(spark, reps: int = 2, paths=("image", "text")) -> dict:
    from robin_sparkles_spark.streaming.media_ingest import (
        stage_arrivals,
        stage_index,
    )
    from robin_sparkles_spark.streaming.text_ingest import (
        stage_text_arrivals,
        stage_text_index,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out = {}
    if "image" in paths:
        fixture_arrivals = stage_arrivals(spark, sf)
        fixture_index = stage_index(spark, sf)
        big_arrivals, big_index = _stage_10x(spark)
        out["image"] = {
            label: _measure(
                arrivals,
                settings,
                reps,
                f"img_{label}",
                lambda mfpt, name, a=arrivals, i=index: _drain(
                    spark, a, i, mfpt, name
                ),
            )
            for label, (arrivals, index, settings) in {
                "fixture": (fixture_arrivals, fixture_index, (1, 4)),
                "10x": (big_arrivals, big_index, (1, 8, 40)),
            }.items()
        }
    if "text" in paths:
        fix_arrivals = stage_text_arrivals(spark, sf)
        fix_bands, fix_payload = stage_text_index(spark, sf)
        big_arrivals, big_bands, big_payload = _stage_text_10x(spark)
        out["text"] = {
            label: _measure(
                arrivals,
                settings,
                reps,
                f"txt_{label}",
                lambda mfpt, name, a=arrivals, b=bands, p=payload: _drain_text(
                    spark, a, b, p, mfpt, name
                ),
            )
            for label, (arrivals, bands, payload, settings) in {
                "fixture": (fix_arrivals, fix_bands, fix_payload, (1, 4)),
                "10x": (big_arrivals, big_bands, big_payload, (1, 8, 40)),
            }.items()
        }
    return out


def main() -> int:
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2
    paths = (
        tuple(sys.argv[sys.argv.index("--paths") + 1].split(","))
        if "--paths" in sys.argv
        else ("image", "text")
    )
    from robin_sparkles_spark.session import get_spark

    spark = get_spark(app_name="stream_ingest_probe")
    print(json.dumps(run(spark, reps=reps, paths=paths)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
