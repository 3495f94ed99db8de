"""auto_tune A/B on the real bench workload (VERDICT r9 ask #9): run
the headline query set untuned, record its stage/task metrics, let the
composite three-knob tuner (``tuner.recommend.auto_tune``: H8 shuffle
width + broadcast threshold + AQE skew split) derive confs from that
recorded evidence, then rerun the same set tuned — one session, both
passes interleaved-free but back-to-back, with per-query walls and the
derived confs in the output.

This is the record→recommend→apply→rerun lifecycle the tuner's unit
tests prove, executed against the actual bench queries rather than a
synthetic job. Output lands in BASELINE.md.

Usage: python tools/autotune_bench_ab.py [--reps 2]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402


def run_set(spark, specs, sf_dir, reps):
    times: dict[str, list[float]] = {}
    for _ in range(reps):
        for name in HEADLINE:
            t0 = time.monotonic()
            specs[name].fn(spark, sf_dir).count()
            times.setdefault(name, []).append(
                round(time.monotonic() - t0, 3)
            )
    return {n: min(v) for n, v in times.items()}


def main() -> int:
    reps = (
        int(sys.argv[sys.argv.index("--reps") + 1])
        if "--reps" in sys.argv
        else 2
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from robin_sparkles_spark import registry
    from robin_sparkles_spark.metrics.collector import current_max_stage_id
    from robin_sparkles_spark.metrics.store import MetricsStore
    from robin_sparkles_spark.session import get_spark
    from robin_sparkles_spark.tuner.recommend import auto_tune, record_run

    spark = get_spark(app_name="autotune_bench_ab")
    specs = registry.all_queries()
    store = MetricsStore(
        spark, os.path.join(REPO, "spark-warehouse", "autotune_ab_metrics"),
        "bench_headline",
    )

    before_conf = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    # pass A: untuned, recorded
    since = current_max_stage_id(spark)
    warm = run_set(spark, specs, sf_dir, 1)  # warm staging/fits OUTSIDE the A/B
    a_times = run_set(spark, specs, sf_dir, reps)
    record_run(store, 0, since_stage_id=since)

    # recommend + apply from the recorded evidence
    report = auto_tune(spark, store)
    after_conf = {k: spark.conf.get(k, None) for k in before_conf}

    # pass B: tuned
    b_times = run_set(spark, specs, sf_dir, reps)

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "conf_before": before_conf,
        "conf_after": after_conf,
        "recommendation": {
            "partitions": report.partitions.partitions,
            "broadcast_threshold": report.broadcast.threshold_bytes,
            "skew_confs": report.skew.confs,
        },
        "untuned_total": round(sum(a_times.values()), 3),
        "tuned_total": round(sum(b_times.values()), 3),
        "untuned": a_times,
        "tuned": b_times,
        "warm_total": round(sum(warm.values()), 3),
    }
    print("RESULT:" + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
