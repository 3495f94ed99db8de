"""Local replica of the driver's t2 correctness gate with per-query
timing: runs every registry query Spark-vs-DuckDB at a given SF and
prints a row per query plus a JSON summary.

Usage: python tools/gate_check.py [sf_dir] [--names n1,n2,...] [--stale N]

``--stale N`` (VERDICT r13 #6) auto-selects the N queries whose last
green DRIVER row (CORRECTNESS_r*.json history at the repo root) is
oldest — the staleness tail the per-round 50-name driver window can't
reach — so the round ritual provably covers it without paying the
full-registry sweep. Never-recorded names sort stalest of all.
Combinable with --names (union).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time
import traceback

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def stalest_names(n: int, registry_names: "list[str]") -> "list[str]":
    """The n registry names with the oldest last-green driver row.
    Staleness key: (last green round, registry order) — never-green
    names get round 0. A row is green if it hash-matched, or — ONLY
    when the row carries no hash verdict at all (the rows-only oracle
    mode) — rows-matched with no error. A row with hash_match=False
    is a real content divergence even if the row counts agree, so it
    must NOT refresh staleness (ADVICE r14)."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        # Malformed history files (top level not a dict, or null/odd
        # rows) are skipped rather than crashing the whole --stale
        # selection (ADVICE r14).
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") or (
                row.get("hash_match") is None
                and row.get("rows_match")
                and row.get("err") is None
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    order = {name: i for i, name in enumerate(registry_names)}
    ranked = sorted(registry_names, key=lambda q: (last.get(q, 0), order[q]))
    return ranked[:n]


def main() -> int:
    # argparse so both '--names=a,b' and '--names a,b' work and any
    # unrecognized argument errors out instead of silently running the
    # whole registry (ADVICE r02).
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--names", help="comma-separated query names to check")
    ap.add_argument(
        "--stale",
        type=int,
        metavar="N",
        help="also check the N stalest-driver-green registry names",
    )
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
    if ns.stale:
        picked = stalest_names(ns.stale, list(registry.all_queries()))
        print(f"stale-{ns.stale} selection: {picked}", file=sys.stderr)
        only = (only or set()) | set(picked)

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
