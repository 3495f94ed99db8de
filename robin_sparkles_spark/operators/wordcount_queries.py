"""Declared queries for the word-count operator family (SURVEY.md §7
Phase 0 — the flagship slice)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from .wordcount import with_stop_words_filtered

# The reference test's parameters (WordCountTest.scala:19-23): split on
# the char-set "#%?!. ", drop this 7-word stop list.
REF_SEPARATORS = "#%?!. "
REF_STOP_WORDS = ("a", "the", "in", "was", "there", "she", "he")


def wordcount_stopword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: stop-word-filtered word count over the documents
    corpus with the reference test's separators + stop list."""
    docs = load_table(spark, sf_dir, "documents")
    return with_stop_words_filtered(
        docs, text_col="text", separators=REF_SEPARATORS, stop_words=REF_STOP_WORDS
    )


_STOPLIST_SQL = ", ".join(f"'{w}'" for w in REF_STOP_WORDS)

WORDCOUNT_ORACLE = f"""
WITH raw AS (
  SELECT unnest(string_split_regex(text, '[#%?!. ]')) AS t FROM documents
),
toks AS (
  SELECT lower(trim(t)) AS word FROM raw
)
SELECT word, count(*) AS "count"
FROM toks
WHERE length(word) > 0 AND word NOT IN ({_STOPLIST_SQL})
GROUP BY word
"""

QUERIES = {
    "wordcount_stopword": (wordcount_stopword, WORDCOUNT_ORACLE),
}
