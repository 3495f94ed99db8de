"""Staged derived-fixture paths under ``spark-warehouse/``.

Some declared queries stage a derived dataset once (planted near-dup
corpus, cached exact top-k baseline) and re-read it — the augmented-
table pattern a real pipeline uses. The staged path embeds a
FINGERPRINT of the source parquet (realpath + size + mtime), so a
regenerated ``/root/testdata`` (it happened between rounds 3 and 4)
silently invalidates every stale staging instead of serving data
derived from the old fixture.
"""

from __future__ import annotations

import hashlib
import os

_WAREHOUSE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "spark-warehouse",
)


def source_fingerprint(sf_dir: str, source_table: str) -> str:
    """Identity + content fingerprint of a source table's parquet
    (realpath|size|mtime). Besides naming staged paths, this is the
    cache key for any memo derived from the table's CONTENT (e.g.
    dedup's corpus-size plan dispatch — ADVICE r12): a rewritten or
    appended source changes the fingerprint, so the memo can't serve
    a stale value within one application."""
    src = os.path.realpath(os.path.join(sf_dir, f"{source_table}.parquet"))
    try:
        st = os.stat(src)
        return f"{src}|{st.st_size}|{int(st.st_mtime)}"
    except OSError:
        return src


def staged_path(sf_dir: str, name: str, source_table: str) -> str:
    """Deterministic staging directory for ``name`` derived from
    ``sf_dir``'s ``source_table`` parquet, keyed by source identity
    AND content fingerprint."""
    ident = source_fingerprint(sf_dir, source_table)
    tag = hashlib.sha1(ident.encode()).hexdigest()[:12]
    return os.path.join(_WAREHOUSE, f"{name}_{tag}")


def is_staged(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


# r15 (guide §2/§6): staged media/archive corpora used to write with
# ``coalesce(1)`` — tidy, but a single-file single-row-group parquet
# is UNSPLITTABLE, so every decode kernel (Arrow mapInPandas over
# payload blobs) ran on ONE core regardless of the session's core
# budget (measured: dedup_video_phash 2.9 s → 1.6 s at sf0.1 just by
# re-laying the 403-clip corpus over 32 files). ``stage_width`` sizes
# the staged layout to the corpus: ~STAGE_ROWS_PER_FILE rows per file,
# capped at the core budget — a 300-row corpus becomes ~cores small
# files (decode parallelism), while the cap keeps tiny corpora from
# producing hundreds of near-empty files. This is fixture staging
# only; corpus-cardinality production indexes follow the ≈8k
# rows/file law in streaming/media_ingest.py.
STAGE_ROWS_PER_FILE = 4


def stage_width(n_rows: int) -> int:
    from ..session import default_parallelism

    return max(
        1, min(default_parallelism(), n_rows // STAGE_ROWS_PER_FILE)
    )
