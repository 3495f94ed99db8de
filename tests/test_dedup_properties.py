"""Property-based fuzzing of the dedup family on GENERATED corpora:
the fixture gate proves parity on one distribution; these prove it on
arbitrary text — unicode words, empty docs, exact copies, single-word
docs — where hash/split edge cases would diverge first.

Each hypothesis example stages a documents.parquet under tmp and runs
the same cross-engine comparison as the driver gate (dedup reads only
the documents table, so a staged dir is a complete sf_dir for it)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from robin_sparkles_spark.operators import dedup

from .oracle_utils import assert_query_matches_oracle

# Words: ASCII + accented + CJK — md5 hashes UTF-8 bytes identically in
# both engines; split is on the single space char in both.
_WORDS = st.sampled_from(
    ["the", "cat", "sat", "über", "naïve", "数据", "x", "longerword", "Zebra42", ""]
)
_DOC = st.lists(_WORDS, min_size=0, max_size=12).map(" ".join)
# Duplicate-rich corpora: draw few distinct docs, repeat them.
_CORPUS = st.lists(_DOC, min_size=1, max_size=12).flatmap(
    lambda docs: st.lists(
        st.sampled_from(docs), min_size=len(docs), max_size=2 * len(docs)
    )
)


def _stage_corpus(tmp_dir, texts: list[str]) -> str:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["gen"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), f"{tmp_dir}/documents.parquet")
    return str(tmp_dir)


@given(texts=_CORPUS)
@settings(max_examples=6, deadline=None)  # each example runs Spark jobs
def test_ngram_oracle_parity_on_generated_corpora(spark, tmp_path_factory, texts):
    sf = _stage_corpus(tmp_path_factory.mktemp("corpus"), texts)
    fn, oracle = dedup.QUERIES["dedup_ngram_jaccard"]
    assert_query_matches_oracle(fn(spark, sf), oracle, sf, tables=("documents",))


@given(texts=_CORPUS)
@settings(max_examples=6, deadline=None)
def test_blocked_equals_bruteforce_on_generated_corpora(spark, tmp_path_factory, texts):
    sf = _stage_corpus(tmp_path_factory.mktemp("corpus"), texts)
    ngram = sorted(map(tuple, dedup.dedup_ngram_jaccard(spark, sf).collect()))
    brute = sorted(map(tuple, dedup.dedup_ngram_jaccard_bruteforce(spark, sf).collect()))
    assert ngram == brute
    # the PREFIX-FILTERED plan (r12; dispatched only above
    # NGRAM_PREFIX_MIN_DOCS, so generated corpora never reach it via
    # the public entry) must agree bit-for-bit on every corpus too —
    # this is the lossless-prefix-theorem check
    prefix = sorted(
        map(tuple, dedup._ngram_jaccard_prefix(spark, sf).collect())
    )
    assert prefix == brute
    blocked = sorted(map(tuple, dedup.dedup_simhash(spark, sf).collect()))
    nlj = sorted(map(tuple, dedup.dedup_simhash_bruteforce(spark, sf).collect()))
    assert blocked == nlj


@given(texts=_CORPUS)
@settings(max_examples=4, deadline=None)
def test_exact_dedup_oracle_parity_on_generated_corpora(
    spark, tmp_path_factory, texts
):
    sf = _stage_corpus(tmp_path_factory.mktemp("corpus"), texts)
    fn, oracle = dedup.QUERIES["dedup_exact"]
    assert_query_matches_oracle(fn(spark, sf), oracle, sf, tables=("documents",))


import pytest


@pytest.mark.parametrize(
    "widths", [w for _, w in dedup.SIMHASH_BLOCK_CONFIGS],
    ids=lambda w: f"m{len(w)}",
)
def test_simhash_blocked_equals_bruteforce_every_config(spark, widths):
    """Every adaptive chunk layout must produce the IDENTICAL exact
    pair set (the config only moves the blocking-rows vs collisions
    trade) — on the real fixture corpus, which has planted near-dups,
    unlike the tiny generated corpora above."""
    sf = "/root/testdata/sf0.001"
    blocked = sorted(
        map(tuple, dedup._dedup_simhash_blocked(spark, sf, widths).collect())
    )
    nlj = sorted(map(tuple, dedup.dedup_simhash_bruteforce(spark, sf).collect()))
    assert blocked == nlj
    assert blocked  # non-vacuous: the fixture plants near-dup pairs


def test_simhash_adaptive_config_selection():
    """key_bits grows with log2(N): the config table is ordered by
    ceiling and the selector is total (last ceiling is None)."""
    ceilings = [c for c, _ in dedup.SIMHASH_BLOCK_CONFIGS[:-1]]
    assert ceilings == sorted(ceilings)
    assert dedup.SIMHASH_BLOCK_CONFIGS[-1][0] is None
    assert dedup._simhash_block_widths(1) == dedup.SIMHASH_BLOCK_CONFIGS[0][1]
    assert (
        dedup._simhash_block_widths(10**12)
        == dedup.SIMHASH_BLOCK_CONFIGS[-1][1]
    )
    # chunk counts (and so keys/doc and key_bits) strictly increase
    ms = [len(w) for _, w in dedup.SIMHASH_BLOCK_CONFIGS]
    assert ms == sorted(set(ms))


@pytest.mark.parametrize(
    "widths", [w for _, w in dedup.SIMHASH_WIDE_BLOCK_CONFIGS],
    ids=lambda w: f"m{len(w)}",
)
def test_simhash_wide_blocked_equals_bruteforce_every_config(spark, widths):
    """The 63-bit wide form under every adaptive chunk layout ==
    its all-pairs bruteforce, on the real fixture corpus."""
    sf = "/root/testdata/sf0.001"
    docs = dedup.simhash_wide_docs(spark, sf)
    blocked = sorted(
        map(
            tuple,
            dedup.hamming_blocked_pairs(
                docs, widths, dedup.SIMHASH_WIDE_MAX_HAMMING
            ).collect(),
        )
    )
    nlj = sorted(
        map(tuple, dedup.dedup_simhash_wide_bruteforce(spark, sf).collect())
    )
    assert blocked == nlj
    assert blocked  # non-vacuous: the fixture plants near-dup pairs


def test_simhash_wide_precision_and_recall(spark):
    """The wide form's design contract (see its constants block): it
    keeps the HIGH-similarity core with ZERO random false pairs (the
    32-bit form's noise floor is the thing it fixes), ceding part of
    the moderate 0.8-0.9 Jaccard band. Measured against the
    exact-Jaccard ≥ 0.8 truth: every wide pair is a true pair
    (precision 1.0) and recall stays above the documented floor."""
    sf = "/root/testdata/sf0.01"
    truth = {
        (r[0], r[1])
        for r in dedup.dedup_ngram_jaccard(spark, sf)
        .select("doc1", "doc2")
        .collect()
    }
    wide = {
        (r[0], r[1])
        for r in dedup.dedup_simhash_wide(spark, sf)
        .select("doc1", "doc2")
        .collect()
    }
    assert truth, "fixture must plant Jaccard ≥ 0.8 pairs"
    assert wide <= truth, f"false positives: {sorted(wide - truth)[:5]}"
    recall = len(wide & truth) / len(truth)
    assert recall >= 0.8, f"wide-simhash recall {recall:.2f} < 0.8"


def test_ngram_df_cap_drops_hot_shingle(spark, tmp_path_factory):
    """Planted corpus-hot shingle (df = 200 > NGRAM_DF_CAP = 128): the
    cap must (a) drop exactly the hot shingle's index rows, (b) bound
    the inverted-index candidate volume — 4 rows here vs the 19904 an
    uncapped join would materialize (C(200,2) from the hot shingle
    alone) — and (c) hold oracle parity under the capped semantics."""
    from pyspark.sql import functions as F

    n_hot = 200
    assert n_hot > dedup.NGRAM_DF_CAP
    texts = [f"hot1 hot2 hot3 u{i}a u{i}b u{i}c u{i}d" for i in range(n_hot)]
    texts += ["dup one two three four five", "dup one two three four five"]
    sf = _stage_corpus(tmp_path_factory.mktemp("hotshingle"), texts)

    total = dedup._shingle_rows(spark, sf).count()
    capped = dedup._df_capped_shingle_rows(spark, sf)
    # exactly the hot shingle's rows (one per hot doc) are dropped
    assert capped.count() == total - n_hot

    a, b = capped.alias("a"), capped.alias("b")
    n_cand = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).count()
    assert n_cand == 4  # only the planted dup pair's shared shingles

    res = dedup.dedup_ngram_jaccard(spark, sf)
    assert {(r.doc1, r.doc2) for r in res.collect()} == {(n_hot, n_hot + 1)}
    assert_query_matches_oracle(res, dedup.DEDUP_NGRAM_SQL, sf, tables=("documents",))


def test_retired_banded_pairs_still_oracle_green(spark, sf_dir):
    """embedding_similar_pairs was RETIRED from the declared registry
    in r11 (band-occupancy-quadratic diagnostic; production =
    embedding_similar_pairs_ivf) but remains the banding-vs-IVF
    comparison point, so it stays oracle-verified here with the same
    Spark-vs-DuckDB hash gate the registry sweep would apply."""
    assert_query_matches_oracle(
        dedup.embedding_similar_pairs(spark, sf_dir),
        dedup.EMBEDDING_SIMILAR_SQL,
        sf_dir,
    )
