"""Registry-grouping ergonomics (VERDICT r7 ask #8): ``by_family()``
partitions the registry, and the README's generated table is in sync
with it (CI check of the generator's --check mode)."""

from __future__ import annotations

import os
import subprocess
import sys

from robin_sparkles_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_by_family_partitions_the_registry():
    fams = registry.by_family()
    flat = [n for names in fams.values() for n in names]
    assert len(flat) == len(set(flat)), "a query appears in two families"
    assert set(flat) == set(registry.all_queries())
    assert all(names for names in fams.values()), "empty family emitted"


def test_readme_registry_table_in_sync():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_registry_table.py"),
         "--check"],
        capture_output=True, text=True, timeout=120, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr or proc.stdout


def test_every_query_gated_or_pinned():
    """The rotation invariant the GATE_FRONT comments maintain by
    hand, machine-checked: every registry query either already has a
    driver correctness row (a key in some CORRECTNESS_r*.json) or is
    pinned into THIS round's 50-name window — so after the round's
    gate runs, the never-gated set stays empty. Catches the failure
    mode of declaring a query without a window slot."""
    import glob
    import json

    gated = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            gated.update(json.load(fh).keys())
    window = set(list(registry.all_queries())[:50])
    missing = sorted(set(registry.all_queries()) - gated - window)
    assert not missing, (
        "queries with no driver row and no window slot this round: "
        f"{missing}"
    )


def test_gate_check_stale_selection(tmp_path):
    """tools/gate_check.py --stale N must pick the N names with the
    OLDEST last-green driver row (never-green names stalest of all,
    registry order breaking ties) — the round ritual's targeted
    staleness sweep (VERDICT r13 #6). Synthetic history: no reliance
    on the repo's real CORRECTNESS files."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import gate_check as gc

    reg = ["a", "b", "c", "d", "e"]
    hist = {
        "CORRECTNESS_r1.json": {
            "a": {"hash_match": True},
            "b": {"hash_match": True},
            "c": {"hash_match": True},
        },
        "CORRECTNESS_r2.json": {
            "a": {"hash_match": True},
            # b: red row — does NOT refresh staleness
            "b": {"hash_match": False, "rows_match": False, "err": "x"},
            # d: rows-only green
            "d": {"rows_match": True, "err": None},
        },
    }
    saved = gc.REPO_ROOT
    try:
        gc.REPO_ROOT = str(tmp_path)
        for fname, rows in hist.items():
            (tmp_path / fname).write_text(json.dumps(rows))
        # e never green (round 0) -> stalest; then b,c (r1); then a,d (r2)
        assert gc.stalest_names(1, reg) == ["e"]
        assert gc.stalest_names(3, reg) == ["e", "b", "c"]
        assert gc.stalest_names(5, reg) == ["e", "b", "c", "a", "d"]
    finally:
        gc.REPO_ROOT = saved
