"""Isolated noop-sink probe for registry queries (guide §1.4).

Usage: python tools/noop_probe.py name1,name2,... [--reps 3] [--sf DIR]

Times each named declared query with the noop sink (forces every
column, discards output) in one session, interleaved reps, and prints
per-query min/median. This is a WARM-session instrument for quick
per-operator inspection; adoption decisions belong to
tools/cold_bench.py, which replicates the driver's cold count()
protocol (the r15 lesson: warm noop A/Bs read "neutral" for changes
the cold protocol read 22-28% regressed). bench.py keeps its
historical count() action for round-over-round comparability (see
OPTIMIZATION_r15.md).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1].startswith("--"):
        print(__doc__)
        return 2
    names = sys.argv[1].split(",")
    reps = (
        int(sys.argv[sys.argv.index("--reps") + 1])
        if "--reps" in sys.argv
        else 3
    )
    sf_dir = (
        sys.argv[sys.argv.index("--sf") + 1]
        if "--sf" in sys.argv
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    from robin_sparkles_spark import registry
    from robin_sparkles_spark.session import get_spark

    spark = get_spark(app_name="noop_probe")
    specs = dict(registry.all_queries())
    # warm: one full pass (JVM, parquet footers, staged fixtures)
    for n in names:
        spark.sparkContext.setJobDescription(f"warm:{n}")
        specs[n].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"probe:{n}")
            t0 = time.perf_counter()
            specs[n].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[n].append(time.perf_counter() - t0)
    for n in names:
        v = times[n]
        print(
            f"{n}: min={min(v):.3f} med={statistics.median(v):.3f} "
            f"reps={[round(x, 3) for x in v]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
