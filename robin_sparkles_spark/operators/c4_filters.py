"""C4 line-level cleaning rules (r15, EXT — Raffel et al. 2020 §2.2).

The other canonical rule set next to Gopher's: C4 cleans at LINE
granularity — keep only lines that (a) end in terminal punctuation,
(b) have ≥ 3 words, (c) do not contain the word "javascript"; then
drop whole pages that (d) have fewer than 5 surviving sentences/lines,
(e) contain "lorem ipsum", or (f) contain a curly brace. (C4's
three-sentence-span dedup is the corpus-level pass —
``line_dedup.docs_line_dedup`` here.)

Verification follows the construct-and-extract pattern
(``web_text.html_extract_text``): fixture documents are single-line
and punctuation-free, so BOTH engines deterministically construct the
same line-structured page from the fixture columns — 8-word chunks;
line i gets terminal punctuation iff (doc_id + i) % 3 ≠ 0; doc_id %
13 == 0 injects "javascript" into line 1; doc_id % 17 == 0 appends a
"lorem ipsum" line; doc_id % 19 == 0 appends a braced code line —
and then run the SAME rule battery, so every rule fires both ways and
the hash gate checks the RULES, not the synthetic input.

Plan shape (100 TB posture): one pure Catalyst projection — array
construction, per-line predicate folds, md5 of the kept
reassembly — zero shuffle, zero Python, whole-stage codegen
end-to-end. The cheapest possible operator class; scales with input
bytes and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table

C4_LINE_WORDS = 8  # constructed-page chunk width
C4_MIN_WORDS = 3  # C4: drop lines with fewer words
C4_MIN_LINES = 5  # C4: drop pages with fewer surviving lines
_TERMINAL = '[.!?"]$'


def _built_lines() -> F.Column:
    """The constructed page as an array<string> of lines (see module
    docstring for the injection rules)."""
    w = C4_LINE_WORDS
    base = (
        f"transform(sequence(1, greatest(cast(ceil(size(words) / {w}.0) as int), 1)),"
        f" i -> concat(array_join(slice(words, (i-1)*{w}+1, {w}), ' '),"
        "  CASE WHEN doc_id % 13 = 0 AND i = 1 THEN ' javascript' ELSE '' END,"
        "  CASE WHEN (doc_id + i) % 3 != 0 THEN '.' ELSE '' END))"
    )
    lorem = (
        f"CASE WHEN doc_id % 17 = 0 THEN concat({base},"
        f" array('lorem ipsum dolor sit amet.')) ELSE {base} END"
    )
    return F.expr(
        f"CASE WHEN doc_id % 19 = 0 THEN concat({lorem},"
        " array('function() { return 1; }'))"
        f" ELSE {lorem} END"
    )


def docs_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc C4 cleaning report: (doc_id, n_lines, short_lines,
    unpunct_lines, js_lines, n_kept_lines, has_lorem, has_brace,
    page_keep, clean_md5)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: F.length(t) > 0).alias(
            "words"
        ),
    )
    b = d.select("doc_id", _built_lines().alias("lines"))
    n_words_line = "size(filter(split(l, ' '), t -> length(t) > 0))"
    short = F.expr(
        f"size(filter(lines, l -> {n_words_line} < {C4_MIN_WORDS}))"
    )
    unpunct = F.expr(f"size(filter(lines, l -> NOT (l rlike '{_TERMINAL}')))")
    js = F.expr(
        "size(filter(lines, l -> contains(lower(l), 'javascript')))"
    )
    kept = F.expr(
        f"filter(lines, l -> {n_words_line} >= {C4_MIN_WORDS}"
        f" AND (l rlike '{_TERMINAL}')"
        " AND NOT contains(lower(l), 'javascript'))"
    )
    page = F.array_join(F.col("lines"), "\n")
    has_lorem = F.expr("contains(lower(array_join(lines, '\\n')), 'lorem ipsum')")
    has_brace = F.expr("contains(array_join(lines, '\\n'), '{')")
    n_kept = F.size(kept)
    return b.select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        short.cast("long").alias("short_lines"),
        unpunct.cast("long").alias("unpunct_lines"),
        js.cast("long").alias("js_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (
            (n_kept >= C4_MIN_LINES) & ~has_lorem & ~has_brace
        ).alias("page_keep"),
        F.md5(F.array_join(kept, "\n")).alias("clean_md5"),
    )


_BUILT_SQL = f"""
CASE WHEN doc_id % 19 = 0 THEN list_append(
  CASE WHEN doc_id % 17 = 0 THEN list_append(base, 'lorem ipsum dolor sit amet.')
       ELSE base END,
  'function() {{ return 1; }}')
WHEN doc_id % 17 = 0 THEN list_append(base, 'lorem ipsum dolor sit amet.')
ELSE base END
"""

_NWL = "len(list_filter(string_split(l, ' '), t -> len(t) > 0))"
_KEEP_L = (
    f"{_NWL} >= {C4_MIN_WORDS}"
    f" AND regexp_matches(l, '{_TERMINAL}')"
    " AND NOT contains(lower(l), 'javascript')"
)

C4_LINE_FILTERS_SQL = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> len(t) > 0) AS words
  FROM documents
),
built AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, GREATEST(CAST(ceil(len(words) / {C4_LINE_WORDS}.0)
                                            AS INT), 1)),
           i -> array_to_string(list_slice(words, (i-1)*{C4_LINE_WORDS}+1,
                                           i*{C4_LINE_WORDS}), ' ')
                || (CASE WHEN doc_id % 13 = 0 AND i = 1
                         THEN ' javascript' ELSE '' END)
                || (CASE WHEN (doc_id + i) % 3 != 0 THEN '.' ELSE '' END)
         ) AS base
  FROM w
),
pages AS (SELECT doc_id, {_BUILT_SQL} AS lines FROM built),
m AS (
  SELECT doc_id, lines,
         len(lines) AS n_lines,
         len(list_filter(lines, l -> {_NWL} < {C4_MIN_WORDS})) AS short_lines,
         len(list_filter(lines, l -> NOT regexp_matches(l, '{_TERMINAL}')))
           AS unpunct_lines,
         len(list_filter(lines, l -> contains(lower(l), 'javascript')))
           AS js_lines,
         list_filter(lines, l -> {_KEEP_L}) AS kept,
         contains(lower(array_to_string(lines, chr(10))), 'lorem ipsum')
           AS has_lorem,
         contains(array_to_string(lines, chr(10)), '{{') AS has_brace
  FROM pages
)
SELECT doc_id,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(short_lines AS BIGINT) AS short_lines,
       CAST(unpunct_lines AS BIGINT) AS unpunct_lines,
       CAST(js_lines AS BIGINT) AS js_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       has_lorem, has_brace,
       (len(kept) >= {C4_MIN_LINES} AND NOT has_lorem AND NOT has_brace)
         AS page_keep,
       md5(COALESCE(array_to_string(kept, chr(10)), '')) AS clean_md5
FROM m
"""


QUERIES = {
    "docs_c4_line_filters": (docs_c4_line_filters, C4_LINE_FILTERS_SQL),
}
