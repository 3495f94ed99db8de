"""Per-query job/stage/task counts via the Spark UI REST API.

VERDICT r15 #2: the driver's scaling block showed every headline query
faster at 8 cores than 32 at sf0.1 — the set is task-overhead-bound,
so the lever is CUTTING jobs/stages/tasks per query, not widening
them. This probe attributes that overhead: each query runs once in a
warm session under its own job group, then the UI REST API is asked
which jobs/stages/tasks that group launched.

Usage: python tools/job_count_probe.py name1,name2,... [--reps 2]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=20) as r:
        return json.loads(r.read())


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1].startswith("--"):
        print(__doc__)
        return 2
    names = sys.argv[1].split(",")
    reps = (
        int(sys.argv[sys.argv.index("--reps") + 1])
        if "--reps" in sys.argv
        else 2
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from robin_sparkles_spark import registry
    from robin_sparkles_spark.session import get_spark

    spark = get_spark(app_name="job_count_probe")
    sc = spark.sparkContext
    specs = dict(registry.all_queries())
    # warm JVM + staging exactly like cold_bench
    specs[HEADLINE[0]].fn(spark, sf_dir).count()

    base = sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId
    out = {}
    for name in names:
        per_rep = []
        for rep in range(reps):
            group = f"probe_{name}_{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            wall = round(time.perf_counter() - t0, 4)
            sc.setJobGroup(None, None)
            jobs = [
                j
                for j in rest(base, "/jobs")
                if j.get("jobGroup") == group
            ]
            n_stages = sum(len(j.get("stageIds", [])) for j in jobs)
            n_tasks = sum(j.get("numTasks", 0) for j in jobs)
            per_rep.append(
                {
                    "wall": wall,
                    "jobs": len(jobs),
                    "stages": n_stages,
                    "tasks": n_tasks,
                }
            )
        out[name] = per_rep
    print("JOB_COUNTS " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
