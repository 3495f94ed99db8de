"""Containment 100× stage profile (r15 — VERDICT r14 #5): with the
q-prefix bound having cut verify candidates 83×, the remaining 23 s
wall at the 500k-doc probe was unattributed — this tool mirrors the
ngram stage-profile method (SCALE.md r14 addendum 3): CUMULATIVE
walls of successive plan prefixes, min over reps, so each stage's
increment is the difference of adjacent rows. Also reports the
deterministic candidate count (the load-immune quantity).

Usage: python tools/containment_stage_profile.py [--copies 100]
[--reps 2]. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"


def main() -> int:
    copies = (
        int(sys.argv[sys.argv.index("--copies") + 1])
        if "--copies" in sys.argv
        else 100
    )
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2

    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators import containment as C
    from robin_sparkles_spark.operators.dedup import (
        _SHINGLES_FROM_WH,
        _WORD_HASH_EXPR,
    )
    from robin_sparkles_spark.session import get_spark

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import sf100_scale_probe as big

    spark = get_spark(app_name="containment_stage_profile")
    sf_dir = big.build_sf100(spark, copies)

    corpus = spark.read.parquet(C.build_containment_corpus(spark, sf_dir))
    sh = (
        corpus.select("doc_id", F.expr(_WORD_HASH_EXPR).alias("wh"))
        .select("doc_id", F.explode(F.expr(_SHINGLES_FROM_WH)).alias("h"))
        .where(F.col("h").isNotNull())
    )
    capped = C._capped_rows(spark, sf_dir)
    payload = capped.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("h")).alias("hs"),
        F.count("*").alias("sz"),
    )
    stages = {
        "s1_scan_explode": sh,
        "s2_df_cap_join": capped,
        "s3_payload_agg": payload,
        "s4_prefix_candidates": C._prefix_candidates(spark, sf_dir),
        "s5_full_query": C.dedup_containment(spark, sf_dir),
    }
    out: dict = {"copies": copies, "reps": reps}
    for name, df in stages.items():
        walls, rows = [], None
        for _ in range(reps):
            t0 = time.monotonic()
            rows = df.count()
            walls.append(round(time.monotonic() - t0, 2))
        out[name] = {"wall_min": min(walls), "rows": rows}
        print(f"STAGE {name}: {json.dumps(out[name])}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
