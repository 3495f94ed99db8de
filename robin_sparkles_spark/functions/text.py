"""Text tokenization / normalization column builders.

Rebuilds the reference word-count transform chain (P1–P3 in SURVEY.md
§2.2; WordCount.scala:15-27) as composable Column expressions:

    split on a separator char-set  →  trim + lowercase  →
    drop empties  →  drop stop words

All JVM-side builtins — at 100 TB this runs inside whole-stage codegen
with no Python in the loop, and the stop-word check is a literal
``isin`` (effectively a broadcast anti-membership test; for stop-lists
too big for a literal, swap in a broadcast ``left_anti`` join — §2.7).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference defaults: WordCount.scala:16-17 (separators " ", stop={the});
# the test exercises "#%?!. " + a 7-word list (WordCountTest.scala:19-23).
DEFAULT_SEPARATORS = " "
DEFAULT_STOP_WORDS = ("the",)


def separators_regex(separators: str) -> str:
    """Turn a separator char-set string into a split regex.

    The reference passes the char-set straight to ``String.split``
    (WordCount.scala:19), where it is a regex — ``"#%?!. "`` only works
    there because each char happens to be a valid 1-char regex or is
    escaped by luck. We make the semantics explicit: a character class
    of the given chars, regex-escaped.
    """
    return "[" + re.escape(separators) + "]"


def tokens_column(
    text: Column | str,
    separators: str = DEFAULT_SEPARATORS,
) -> Column:
    """Array of trimmed, lower-cased tokens (P1+P2). Empty tokens kept
    here; filter with ``token_filter`` after exploding (or use
    ``F.filter`` on the array to drop them pre-explode — cheaper, since
    it shrinks the exploded row count)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.transform(
        F.split(col, separators_regex(separators)),
        lambda t: F.lower(F.trim(t)),
    )


def token_filter(
    token: Column,
    stop_words: tuple[str, ...] = DEFAULT_STOP_WORDS,
) -> Column:
    """P3: keep non-empty tokens not in the (lower-cased) stop list.

    Lower-casing the stop list first mirrors WordCount.scala:21.
    """
    lc_stop = [w.lower() for w in stop_words]
    return (F.length(token) > 0) & ~token.isin(lc_stop)


def ws_tokens(text: Column | str = "text") -> Column:
    """The plain whitespace tokenizer the document-pipeline operators
    share (chunking, rarity top-k, retrieval, token counts): split on
    single spaces, drop empties, NO case-folding or trimming — one
    definition so every family agrees on what a term is (its DuckDB
    twin is ``ws_tokens_sql``)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, " "), lambda t: F.length(t) > 0)


def ws_tokens_sql(col: str = "text") -> str:
    """DuckDB twin of ``ws_tokens`` as a SQL fragment."""
    return f"list_filter(string_split({col}, ' '), t -> len(t) > 0)"
