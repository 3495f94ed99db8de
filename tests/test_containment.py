"""Containment dedup (r13): planted embedded-document recall, the
Jaccard-invisibility property that motivates the operator, and oracle
parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from robin_sparkles_spark.operators import containment as C
from robin_sparkles_spark.operators.dedup import JACCARD_THRESHOLD

from .oracle_utils import assert_query_matches_oracle


def test_containment_oracle_parity(spark, sf_dir):
    assert_query_matches_oracle(
        C.dedup_containment(spark, sf_dir),
        C.dedup_containment_oracle,
        sf_dir,
    )


def test_planted_pairs_found_at_full_containment(spark, sf_dir):
    """Every planted (inner, inner+OFFSET) pair must surface with
    containment exactly 1.0 — the outer document contains the inner's
    text verbatim, so every inner shingle is shared."""
    rows = {
        (r.inner_doc, r.outer_doc): r.containment
        for r in C.dedup_containment(spark, sf_dir).collect()
    }
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    expected = min(C.CONTAIN_N, n_docs)
    found = 0
    for i in range(expected):
        key = (i, i + C.CONTAIN_ID_OFFSET)
        if key in rows:
            found += 1
            assert rows[key] == 1.0, (key, rows[key])
    assert found == expected, f"planted recall {found}/{expected}"


def test_planted_pairs_are_invisible_to_jaccard(spark, sf_dir):
    """The operator's reason to exist: the planted pairs' JACCARD over
    the same staged corpus sits under the dedup threshold (the filler
    dilutes the union), so symmetric near-dup detection cannot find
    them. Checked on the real shingle pipeline, not the prose."""
    corpus = spark.read.parquet(C.build_containment_corpus(spark, sf_dir))
    from robin_sparkles_spark.operators.dedup import (
        _SHINGLES_FROM_WH,
        _WORD_HASH_EXPR,
    )

    sets = (
        corpus.where(
            (F.col("doc_id") < C.CONTAIN_N)
            | (F.col("doc_id") >= C.CONTAIN_ID_OFFSET)
        )
        .select("doc_id", F.expr(_WORD_HASH_EXPR).alias("wh"))
        .select(
            "doc_id",
            F.array_distinct(F.expr(_SHINGLES_FROM_WH)).alias("sh"),
        )
    )
    by_id = {r.doc_id: set(r.sh) for r in sets.collect() if r.sh != [None]}
    checked = 0
    for i in range(C.CONTAIN_N):
        a, b = by_id.get(i), by_id.get(i + C.CONTAIN_ID_OFFSET)
        if not a or not b:
            continue
        checked += 1
        j = len(a & b) / len(a | b)
        cont = len(a & b) / min(len(a), len(b))
        assert cont >= C.CONTAIN_THRESHOLD
        assert j < JACCARD_THRESHOLD, (i, j)
    assert checked > 0


def test_inner_is_the_smaller_set(spark, sf_dir):
    """Labeling contract: inner_doc's capped set is never larger than
    outer_doc's (ties keep the smaller id as inner)."""
    out = C.dedup_containment(spark, sf_dir)
    planted = out.where(F.col("outer_doc") >= C.CONTAIN_ID_OFFSET)
    assert planted.where(F.col("inner_doc") >= C.CONTAIN_ID_OFFSET).count() == 0
    assert out.where(F.col("containment") > 1.0).count() == 0


def test_prefix_plan_matches_full_index_bitwise(spark, sf_dir):
    """The above-threshold asymmetric-prefix plan must produce the
    IDENTICAL row set as the full-index plan (lossless prefix theorem
    at τ = 0.9) — forced on the fixture where both are runnable."""
    full = {
        (r.inner_doc, r.outer_doc, r.containment)
        for r in C._containment_full_index(spark, sf_dir).collect()
    }
    pref = {
        (r.inner_doc, r.outer_doc, r.containment)
        for r in C._containment_prefix(spark, sf_dir).collect()
    }
    assert pref == full
    assert full  # non-vacuous: the planted pairs are in there


def test_prefix_parity_on_tiny_shingle_sets(spark, tmp_path):
    """q-prefix edge coverage (r14): docs with sz = 1 (exactly 3
    words) and sz = 2 (4 words) exercise the ⌈τ|A|⌉ < 2 fallback —
    the ≥2-hit rule must relax to 1 hit for singleton sets or true
    pairs vanish. Synthetic corpus with exact copies and an embedded
    superset; prefix arm must equal full-index arm bitwise."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "alpha beta gamma",                      # sz=1
        "alpha beta gamma",                      # exact copy -> containment 1.0
        "alpha beta gamma delta",                # sz=2, contains the 3-gram above
        "epsilon zeta eta theta iota",           # sz=3, unrelated
        "alpha beta gamma delta epsilon zeta",   # superset of both above
        "mu nu",                                 # < 3 words: no shingles at all
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["gen"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), f"{tmp_path}/documents.parquet")
    sf = str(tmp_path)
    full = {
        (r.inner_doc, r.outer_doc, r.containment)
        for r in C._containment_full_index(spark, sf).collect()
    }
    pref = {
        (r.inner_doc, r.outer_doc, r.containment)
        for r in C._containment_prefix(spark, sf).collect()
    }
    assert pref == full
    # non-vacuous: the sz=1 exact copy and the embedded sz=1 -> sz=2
    # containments must both be present with containment 1.0
    assert (0, 1, 1.0) in full
    assert (0, 2, 1.0) in full
