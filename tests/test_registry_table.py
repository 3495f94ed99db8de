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
