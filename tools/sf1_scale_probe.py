"""One-scale-point-up probe for the heavy dedup/ANN families
(VERDICT r7 ask #5): derive an sf1-equivalent corpus (10× the sf0.1
documents/embeddings) and time the families at sf0.1 vs sf1, so the
100× extrapolation in SCALE.md rests on a measured 10× hop above the
bench scale instead of only sf0.01→sf0.1.

The driver ships no sf1 fixtures, so the corpus is derived: 10 copies
of the sf0.1 tables with a DECORRELATING transform per copy k —
every word in copy k>0 gets a ``_k`` suffix (all shingles distinct
across copies: near-dup structure is preserved within a copy, never
created between copies — and the 10× vocabulary makes the inverted
indexes strictly harder, a conservative scale-up), and embeddings are
multiplied elementwise by a deterministic ±1 sign mask per copy
(norm-preserving, decorrelating: expected cross-copy cosine ≈ 0).
Copy 0 is the identity, so the original dup/neighbor structure is a
subset of the scaled corpus. Other tables are symlinked from sf0.1
(the probed families read only documents/embeddings).

Each query runs REPS times per scale in one session; rep 1 includes
staging/fit cost, later reps are steady state. Output: one JSON line
with per-query seconds and sf1/sf0.1 ratios.

Usage: python tools/sf1_scale_probe.py [--copies 10] [--reps 2]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1_DIR = os.path.join(REPO, "spark-warehouse", "sf1_scaleup")

QUERIES = (
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "embedding_similar_pairs",
    "embedding_dedup",
    "semdedup_dropped",
    "ann_lsh_topk",
    "ann_bruteforce_topk",
    # r9 additions: the PQ pipeline (fit+encode, then the bounded-Q
    # ADC scan + re-rank) and the n-gram LM/span family
    "pq_encode",
    "pq_rerank_topk",
    "ngram_lm_score",
    "ngram_repeated_spans",
    # late-r9 additions: the IVFPQ composition, backoff LM, ranked
    # retrieval, and the source-overlap diagnostic
    "ann_ivfpq_topk",
    "ngram_backoff_score",
    "docs_search_bm25",
    "source_overlap_matrix",
    # r10 additions: the maximal-span chains (gram-count join + per-doc
    # window) — the zstd/OPQ additions are covered by the media probe
    # and the bounded-Q recall gates respectively
    "ngram_maximal_spans",
    # late-r11: the 63-bit wide simhash (the 32-bit noise-floor fix)
    # and the streaming text-ingest batch twin (incremental join shape
    # + grouped argmax)
    "dedup_simhash_wide",
    "dedup_text_stream_ingest",
)

SCALED = ("documents", "embeddings")
LINKED = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events",
)


def build_sf1(spark, copies: int) -> str:
    from pyspark.sql import functions as F

    os.makedirs(SF1_DIR, exist_ok=True)
    for t in LINKED:
        link = os.path.join(SF1_DIR, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SF01, f"{t}.parquet"), link)

    docs_path = os.path.join(SF1_DIR, "documents.parquet")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        base = spark.read.parquet(f"{SF01}/documents.parquet")
        n = base.count()
        parts = []
        for k in range(copies):
            c = base.withColumn("doc_id", F.col("doc_id") + F.lit(k * 10 * n))
            if k:
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1_{k}")
                )
            parts.append(c.withColumn("n_chars", F.length("text")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(docs_path)

    emb_path = os.path.join(SF1_DIR, "embeddings.parquet")
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        import random

        base = spark.read.parquet(f"{SF01}/embeddings.parquet")
        n = base.count()
        dim = len(base.select("embedding").first()[0])
        parts = []
        for k in range(copies):
            c = base.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10 * n))
            if k:
                rng = random.Random(1000 + k)
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
        out.repartition(32).write.mode("overwrite").parquet(emb_path)
    return SF1_DIR


def time_queries(spark, sf_dir: str, reps: int) -> dict:
    from robin_sparkles_spark import registry

    specs = dict(registry.all_queries())
    # the r11-retired banding diagnostic stays probed (it is the
    # comparison row the production IVF twin is judged against)
    from robin_sparkles_spark.operators.dedup import (
        EMBEDDING_SIMILAR_SQL,
        embedding_similar_pairs,
    )

    specs.setdefault(
        "embedding_similar_pairs",
        registry.QuerySpec(embedding_similar_pairs, EMBEDDING_SIMILAR_SQL),
    )
    out: dict[str, list[float]] = {}
    for rep in range(reps):
        for name in QUERIES:
            t0 = time.monotonic()
            specs[name].fn(spark, sf_dir).count()
            out.setdefault(name, []).append(round(time.monotonic() - t0, 3))
    return out


def time_table_assign(spark, sf_dir: str) -> dict:
    """The join-form (centroid-TABLE) k-means fit+assign at this
    scale's adaptive width — the k > K_LITERAL_MAX machinery from
    VERDICT r11 #2, forced on regardless of the dispatch threshold so
    the 10× hop measures the SCALE PATH itself (at gate scales the
    dispatch keeps the literal plan). k = n/64 here so the probe
    exercises a genuinely wide fit (78 → 781 for 10× embeddings)."""
    import time as _t

    from pyspark.sql import functions as F
    from robin_sparkles_spark.operators import clustering as C

    vecs = C._vectors(spark, sf_dir)
    n = vecs.count()
    k = max(C.K_CLUSTERS, n // 64)
    t0 = _t.monotonic()
    assigned = C.fit_and_assign_table(spark, vecs, k)
    n_assigned = assigned.count()
    wall = round(_t.monotonic() - t0, 3)
    return {
        "n": n,
        "k": k,
        "coarse_k": C._coarse_k_for(k),
        "nprobe": C.ASSIGN_NPROBE,
        "assigned": n_assigned,
        "coverage": round(n_assigned / n, 4),
        "wall_sec": wall,
    }


def main() -> int:
    copies = int(sys.argv[sys.argv.index("--copies") + 1]) if "--copies" in sys.argv else 10
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2
    from robin_sparkles_spark.session import get_spark

    spark = get_spark(app_name="sf1_scale_probe")
    build_sf1(spark, copies)
    if "--table-assign" in sys.argv:
        small = time_table_assign(spark, SF01)
        big = time_table_assign(spark, SF1_DIR)
        result = {
            "probe": "kmeans_table_assign",
            "copies": copies,
            "sf01": small,
            "sf1": big,
            "ratio": round(big["wall_sec"] / max(small["wall_sec"], 1e-9), 2),
        }
        print("RESULT:" + json.dumps(result))
        return 0
    small = time_queries(spark, SF01, reps)
    big = time_queries(spark, SF1_DIR, reps)
    result = {
        "copies": copies,
        "reps": reps,
        "sf01_last": {k: v[-1] for k, v in small.items()},
        "sf1_last": {k: v[-1] for k, v in big.items()},
        "sf01_first": {k: v[0] for k, v in small.items()},
        "sf1_first": {k: v[0] for k, v in big.items()},
        "ratio_last": {
            k: round(big[k][-1] / max(small[k][-1], 1e-9), 2) for k in small
        },
    }
    print("RESULT:" + json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
