"""Stop-word-filtered word count — the reference's demo workload
(WordCount.scala:15-27; operators P1–P4 + A1 in SURVEY.md §2), rebuilt
as one declarative DataFrame pipeline:

    filter(tokens) → explode → groupBy(word).count()

Scale notes (100 TB):
- The array-level ``F.filter`` runs *before* ``explode``, so empty and
  stop-word tokens never become rows — explode output is the dominant
  row count in this job, and shrinking it early shrinks the shuffle.
- ``groupBy().count()`` compiles to HashAggregateExec partial+final —
  the same map-side-combine the reference got from ``reduceByKey``
  (WordCount.scala:25), but codegen'd and spillable.
- No Python touches any row; the whole plan is one codegen stage up to
  the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import (
    DEFAULT_SEPARATORS,
    DEFAULT_STOP_WORDS,
    token_filter,
    tokens_column,
)


def with_stop_words_filtered(
    df: DataFrame,
    text_col: str = "value",
    separators: str = DEFAULT_SEPARATORS,
    stop_words: tuple[str, ...] = DEFAULT_STOP_WORDS,
) -> DataFrame:
    """Word frequencies excluding stop words.

    Output schema ``word string, count bigint`` — the DataFrame twin of
    the reference's ``RDD[(String, Int)]`` (WordCount.scala:17).
    """
    tokens = tokens_column(text_col, separators)
    kept = F.filter(tokens, lambda t: token_filter(t, stop_words))
    return (
        df.select(F.explode(kept).alias("word"))
        .groupBy("word")
        .count()
    )
