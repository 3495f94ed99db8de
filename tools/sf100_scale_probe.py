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
Prints one JSON line: per-query {wall_1x, wall_100x, ratio, rows_1x,
rows_100x, rows_per_copy}.
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
    "dedup_minhash_lsh",
    "dedup_simhash_wide",
    "dedup_ngram_jaccard",
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


def run(spark, copies: int, reps: int) -> dict:
    from robin_sparkles_spark import registry

    sf100 = build_sf100(spark, copies)
    specs = registry.all_queries()
    out = {}
    walls: dict[str, dict[str, list]] = {}
    for label, sf in (("1x", SF01), (f"{copies}x", sf100)):
        for rep in range(reps):
            for name in QUERIES:
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


def main() -> int:
    copies = (
        int(sys.argv[sys.argv.index("--copies") + 1])
        if "--copies" in sys.argv
        else 100
    )
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2
    from robin_sparkles_spark.session import get_spark

    spark = get_spark(app_name="sf100_scale_probe")
    print(json.dumps({"copies": copies, "queries": run(spark, copies, reps)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
