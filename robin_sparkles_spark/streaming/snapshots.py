"""Versioned-snapshot state commit — the shared crash-correctness
protocol behind every foreachBatch state table here (CDC apply, the
media/text ingest index maintenance).

Protocol: read the snapshot the ``_LATEST`` marker names → write the
NEXT version to its own directory (never touching the files being
read) → atomically flip the marker (tmp file + ``os.replace``) →
prune versions older than the previous one (kept for readers that
resolved the marker just before the flip). The marker flip is the
COMMIT POINT: a version directory that exists while the marker still
names an older version is by definition the debris of a crashed or
retried attempt under the single-writer contract (Structured
Streaming re-invokes foreachBatch for a failed micro-batch), so
``claim_next`` removes and re-claims it instead of failing the retry
— the bug class a full-suite run caught in the CDC module's first
draft, now fixed in ONE place (review finding: three hand copies of
this logic would drift).

SINGLE-WRITER contract: read-v(n) → write-v(n+1) → flip is not safe
under concurrent appliers (both target v(n+1); the flip is
last-writer-wins). This matches the Structured Streaming execution
model — one query = one sequential micro-batch applier per state
path. Exactly-once holds under that model only.
"""

from __future__ import annotations

import os
import shutil

MARKER = "_LATEST"


def latest_version(state_path: str) -> int | None:
    """The committed version number, or None before the first commit."""
    try:
        with open(os.path.join(state_path, MARKER)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def version_dir(state_path: str, version: int) -> str:
    return os.path.join(state_path, f"v{version}")


def claim_next(state_path: str) -> tuple[str, int]:
    """Directory + number for the NEXT version, with crash/retry
    debris (an existing uncommitted directory) cleared."""
    n = latest_version(state_path)
    nxt = 0 if n is None else n + 1
    claimed = version_dir(state_path, nxt)
    if os.path.exists(claimed):
        shutil.rmtree(claimed, ignore_errors=True)
    return claimed, nxt


def commit(state_path: str, version: int) -> None:
    """Atomically flip the marker to ``version`` and prune snapshots
    older than the previous one."""
    tmp = os.path.join(state_path, f".{MARKER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(state_path, MARKER))
    for name in os.listdir(state_path):
        if (
            name.startswith("v")
            and name[1:].isdigit()
            and int(name[1:]) < version - 1
        ):
            shutil.rmtree(os.path.join(state_path, name), ignore_errors=True)
