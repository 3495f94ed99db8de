#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock over the headline set; per-query times in
``queries``. Each query is executed with a count() action (forces the
full plan, returns only a scalar to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

# Headline queries (subset of the registry that spans the operator
# families; extended as phases land).
HEADLINE = [
    "wordcount_stopword",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_customers_revenue",
    "order_lineitem_rollup",
    "window_running_user_spend",
    "events_user_stats",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "events_tumbling_1h",
    "user_sessions",
    "text_top_terms",
    "orders_asof_last_event",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from robin_sparkles_spark.session import get_spark
    from robin_sparkles_spark import registry

    spark = get_spark(app_name="robin_sparkles_bench")
    specs = registry.all_queries()
    names = [n for n in HEADLINE if n in specs]

    # Warm the JVM + parquet footer caches once so per-query numbers
    # measure the query, not session startup.
    specs[names[0]].fn(spark, sf_dir).count()

    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": round(sum(times.values()), 4),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
