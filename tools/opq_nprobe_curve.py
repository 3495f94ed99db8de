#!/usr/bin/env python
"""OPQ∘IVFPQ vs plain IVFPQ recall across the nprobe dial (r11 —
VERDICT r10 ask #6).

The r10 record showed the composition only at the probe-bounded
nprobe=2 point (0.528 vs 0.520 at sf0.01), which leaves open WHERE the
learned rotation's gain emerges once the coarse quantizer stops
dominating. This sweeps nprobe=1..K_CLUSTERS for both pipelines at the
same (cells, shortlist, 8-byte) budget and prints a BASELINE.md-ready
table. nprobe=K scans every cell, so both pipelines' recall there is
the pure PQ-code ceiling — the rotation's codebook gain isolated from
probe loss.

Usage: python tools/opq_nprobe_curve.py [sf_dir] [nprobe...]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def recall_at(spark, sf_dir: str, nprobe: int, rotated: bool) -> tuple[float, float]:
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators import opq, pq
    from robin_sparkles_spark.operators.similarity import (
        TOP_K,
        build_exact_topk,
    )

    t0 = time.perf_counter()
    kwargs = {}
    if rotated:
        kwargs = {
            "vecs": opq.rotated_unit_index(spark, sf_dir),
            "books": opq._opq_books(spark, sf_dir),
            "coarse": opq._opq_coarse(spark, sf_dir),
        }
    rr = (
        pq._ivfpq_topk_from(spark, sf_dir, nprobe=nprobe, **kwargs)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    bf = spark.read.parquet(build_exact_topk(spark, sf_dir))
    row = (
        bf.join(rr, ["query_id", "neighbor_id"], "left")
        .agg(
            F.countDistinct("query_id").alias("nq"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits"),
        )
        .collect()[0]
    )
    return row.hits / (row.nq * TOP_K), time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    probes = [int(a) for a in sys.argv[2:]] or [1, 2, 4, 8]

    from robin_sparkles_spark.session import get_spark

    spark = get_spark(app_name="opq_nprobe_curve")
    print(f"# sf_dir={sf_dir}")
    print("| nprobe | IVFPQ recall@5 | OPQ∘IVFPQ recall@5 | Δ | sec (plain/opq) |")
    print("|---|---|---|---|---|")
    for nprobe in probes:
        plain, t_p = recall_at(spark, sf_dir, nprobe, rotated=False)
        rot, t_r = recall_at(spark, sf_dir, nprobe, rotated=True)
        print(
            f"| {nprobe} | {plain:.3f} | {rot:.3f} | {rot - plain:+.3f} "
            f"| {t_p:.1f}/{t_r:.1f} |"
        )


if __name__ == "__main__":
    main()
