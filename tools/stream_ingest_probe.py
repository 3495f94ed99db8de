"""Micro-batch overhead probe for the streaming ingest paths (late
r11; closes the written r12 candidate #4): the same arrival corpus
drained through the read-only image-ingest stream at different
``maxFilesPerTrigger`` settings — 1 file/trigger (many micro-batches,
maximum per-batch overhead) vs all files in one trigger (the batch
limit). The delta IS the micro-batch tax: per-trigger planning +
state commit + the per-batch dHash/index-join fixed costs.

Two corpus sizes: the fixture corpus (400 base images, 4 arrival
files) and the 10× probe corpus (4000 base images, re-sharded to 40
arrival files) — so the tax is measured both where it dominates and
where real work amortizes it.

Usage: python tools/stream_ingest_probe.py [--reps 2]
Prints one JSON line {"fixture": {...}, "10x": {...}} with
per-setting wall seconds (min over reps) and the drained row count.
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


def run(spark, reps: int = 2) -> dict:
    from robin_sparkles_spark.streaming.media_ingest import (
        stage_arrivals,
        stage_index,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    fixture_arrivals = stage_arrivals(spark, sf)
    fixture_index = stage_index(spark, sf)
    big_arrivals, big_index = _stage_10x(spark)
    out = {}
    cases = {
        "fixture": (fixture_arrivals, fixture_index, (1, 4)),
        "10x": (big_arrivals, big_index, (1, 8, 40)),
    }
    for label, (arrivals, index, settings) in cases.items():
        row = {}
        for i, mfpt in enumerate(settings):
            best, rows = None, None
            for r in range(reps):
                wall, rows = _drain(
                    spark, arrivals, index, mfpt, f"p_{label}_{mfpt}_{r}"
                )
                best = wall if best is None else min(best, wall)
            n_files = len(
                [f for f in os.listdir(arrivals) if f.endswith(".parquet")]
            )
            row[f"mfpt_{mfpt}"] = {
                "wall": round(best, 3),
                "triggers": -(-n_files // mfpt),
                "rows": rows,
            }
        out[label] = row
    return out


def main() -> int:
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2
    from robin_sparkles_spark.session import get_spark

    spark = get_spark(app_name="stream_ingest_probe")
    print(json.dumps(run(spark, reps=reps)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
