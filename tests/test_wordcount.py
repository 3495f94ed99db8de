"""Word-count parity with the reference test suite
(WordCountTest.scala:11-31) plus the oracle twin check."""

from __future__ import annotations

from robin_sparkles_spark.operators.wordcount import with_stop_words_filtered
from robin_sparkles_spark.operators.wordcount_queries import (
    QUERIES,
    REF_SEPARATORS,
    REF_STOP_WORDS,
)
from robin_sparkles_spark.sources import text_corpus_df

from .oracle_utils import assert_query_matches_oracle

# Exact corpus from WordCountTest.scala:15-17 (FIXTURES.md A1).
PANDA_LINES = [
    "How happy was the panda? You ask.",
    "Panda is the most happy panda in all the#!?ing land!",
]


def test_reference_golden_assertions(spark):
    df = text_corpus_df(spark, PANDA_LINES)
    counts = dict(
        with_stop_words_filtered(
            df, separators=REF_SEPARATORS, stop_words=REF_STOP_WORDS
        ).collect()
    )
    # WordCountTest.scala:25-29
    assert "the" not in counts
    assert "?" not in counts
    assert "#!?ing" not in counts
    assert "ing" in counts
    assert counts["panda"] == 3


def test_default_params_words_txt(spark):
    # FIXTURES.md A2: default separators " ", stop words {"the"}
    # (WordCount.scala:16-17) over the Words.txt corpus.
    lines = ["I am some words", "Words And words Woooooooooooo", "Panda words"]
    counts = dict(with_stop_words_filtered(text_corpus_df(spark, lines)).collect())
    assert counts["words"] == 4
    assert counts["panda"] == 1
    assert "the" not in counts


def test_empty_input(spark):
    df = text_corpus_df(spark, [])
    assert with_stop_words_filtered(df).count() == 0


def test_wordcount_oracle_parity(spark, sf_dir):
    fn, oracle = QUERIES["wordcount_stopword"]
    assert_query_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.queries()) >= set(mod.oracle_sql())
