"""Candidate-pair payload fetch with ONE index shuffle.

The dedup/ANN verify stage joins a candidate-pair table (c1, c2)
back to a corpus-sized index (doc → shingle set, vec → unit vector)
to score each pair. Written as two fetch joins, the index is
shuffled TWICE (Catalyst does not reuse the exchange across the two
different join keys — r10 measurement), and before r10 the planner
hid that cost by broadcasting the index, which OOMs at corpus scale
(see dedup.dedup_ngram_jaccard).

This helper restructures the fetch: union-tag each pair under both
of its ids, equi-join the index ONCE (one corpus shuffle), then fold
the two rows per pair back into one with first(when) aggregates —
2·|pairs| skinny rows through the join and one |pairs|-keyed
aggregate instead of a second corpus-wide shuffle. Identical output
to the two-join form (each side of a pair matches exactly one index
row, and c1 != c2 per pair so the tags never collide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pair_payload_fetch(
    pairs: DataFrame,
    index: DataFrame,
    key: str,
    payload: str,
    c1: str,
    c2: str,
    p1: str,
    p2: str,
) -> DataFrame:
    """Attach ``index.payload`` to both sides of every (c1, c2) pair.

    ``pairs`` must have exactly the columns (c1, c2) with c1 != c2
    on every row (strict-ordered pairs and cross-corpus pairs both
    qualify);
    ``index`` maps ``key`` (unique) to ``payload``. Returns
    (c1, c2, p1, p2). The index side is SHUFFLE_HASH-pinned: it is
    corpus-sized by definition here, and broadcast must never be left
    to size estimates (r10 audit).

    Contract fine print (r11, ADVICE): the final groupBy makes this
    identical to the two-join form only under the stated contract —
    (a) pairs are DISTINCT (duplicate (c1,c2) rows collapse to one
    here, where two joins would keep both), and (b) the index is
    TOTAL over pair ids (a pair whose key misses the index surfaces
    with null payloads here, where two inner joins would drop it).
    Every current call site passes distinct pairs derived from the
    same corpus the index covers; a new call site that cannot
    guarantee both must use the two-join form instead."""
    tagged = pairs.select(
        F.col(c1).alias(key), F.col(c1), F.col(c2)
    ).unionByName(pairs.select(F.col(c2).alias(key), F.col(c1), F.col(c2)))
    joined = tagged.join(index.hint("shuffle_hash"), key)
    return joined.groupBy(c1, c2).agg(
        F.first(
            F.when(F.col(key) == F.col(c1), F.col(payload)), ignorenulls=True
        ).alias(p1),
        F.first(
            F.when(F.col(key) == F.col(c2), F.col(payload)), ignorenulls=True
        ).alias(p2),
    )
