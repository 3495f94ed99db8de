"""Local replica of the driver's t2 correctness gate with per-query
timing: runs every registry query Spark-vs-DuckDB at a given SF and
prints a row per query plus a JSON summary.

Usage: python tools/gate_check.py [sf_dir] [--names n1,n2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> int:
    # argparse so both '--names=a,b' and '--names a,b' work and any
    # unrecognized argument errors out instead of silently running the
    # whole registry (ADVICE r02).
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--names", help="comma-separated query names to check")
    ns = ap.parse_args()
    sf_dir = ns.sf_dir
    only = set(ns.names.split(",")) if ns.names else None

    from robin_sparkles_spark import registry
    from robin_sparkles_spark.session import get_spark
    from tests.oracle_utils import assert_query_matches_oracle

    if only:
        unknown = only - set(registry.all_queries())
        if unknown:
            print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
            return 2

    # Session-shape overrides for partition-invariance sweeps: every
    # declared query claims its result is independent of parallelism
    # and shuffle width (the determinism rules in registry.py) — a
    # gate run with an adversarial shape (odd widths, fewer cores)
    # executes that claim instead of asserting it.
    master = os.environ.get("SPARK_GRAFT_GATE_MASTER", "local[8]")
    shuffle = int(os.environ.get("SPARK_GRAFT_GATE_SHUFFLE", "8"))
    spark = get_spark(
        app_name="gate_check", master=master, shuffle_partitions=shuffle
    )
    results: dict[str, dict] = {}
    t_all = time.time()
    for name, spec in registry.all_queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        row: dict = {}
        try:
            oracle = registry.resolve_oracle(spec.oracle, sf_dir)
            if oracle is None:
                n = spec.fn(spark, sf_dir).count()
                row = {"mode": "rows_only", "spark_rows": n, "ok": n >= 0}
            else:
                assert_query_matches_oracle(spec.fn(spark, sf_dir), oracle, sf_dir)
                n = spec.fn(spark, sf_dir).count()
                row = {"mode": "oracle", "spark_rows": n, "ok": True}
        except Exception as e:  # noqa: BLE001
            row = {"mode": "error", "ok": False, "err": f"{type(e).__name__}: {e}"}
            traceback.print_exc(limit=3)
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        print(f"{'OK ' if row['ok'] else 'FAIL'} {name:38s} {row['sec']:7.2f}s rows={row.get('spark_rows', '-')}")
        sys.stdout.flush()
    total = round(time.time() - t_all, 1)
    n_ok = sum(1 for r in results.values() if r["ok"])
    print(json.dumps({"total_sec": total, "ok": n_ok, "n": len(results)}))
    bad = [n for n, r in results.items() if not r["ok"]]
    if bad:
        print("FAILURES:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
