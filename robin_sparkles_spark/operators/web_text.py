"""Web-text operators (r7): HTML→text extraction and URL
normalization as PURE Catalyst expression chains — the step a crawl
pipeline runs right after the WARC walk (``archive_parse``), kept on
the JVM fast path: regexp/replace/split/array ops inside whole-stage
codegen, zero Python, no shuffle (map-only projections).

Verification follows the construct-and-extract pattern: both engines
build the SAME deterministic HTML/URL per document from the fixture
columns (no staging needed) and run the SAME extraction pipeline —
the hash gate checks the extraction semantics, not the synthetic
input. Regex portability notes: patterns restricted to the Java-regex
∩ RE2 subset (``[\\s\\S]*?`` non-greedy blocks, ``[^>]+`` tags,
``' +'`` whitespace); entity decoding is plain ``replace`` chains;
DuckDB's ``regexp_replace`` needs the explicit ``'g'`` flag where
Spark's replaces all matches by default.

At 100 TB: both queries are scan → codegen'd projection → (tiny) agg
or plain projection; they scale with input bytes and nothing else —
exactly why extraction belongs in expressions, not UDFs (a Python
HTML parser here would be the classic 10-100× slow path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table

# --- deterministic HTML construction (shared contract) ----------------------
# One entity-bearing snippet makes the decode step non-vacuous.
_SNIPPET = "Tom &amp; Jerry &lt;3 &quot;cartoons&quot;"


def _html_expr() -> F.Column:
    link = '<a href="http://h.test/x">link</a>'
    return F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit('</title><script type="text/javascript">var t = 1; '
              "if (t < 2) { t = t + 1; }</script>"
              "<style>body { color: red; }</style></head><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(f" {_SNIPPET}</p>"),
        F.expr(f"repeat('{link}', doc_id % 3 + 1)"),
        F.lit("</body></html>"),
    )


_HTML_SQL = (
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
    "'</title><script type=\"text/javascript\">var t = 1; "
    "if (t < 2) { t = t + 1; }</script>"
    "<style>body { color: red; }</style></head><body><h1>Doc ' || "
    "CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
    f"' {_SNIPPET}</p>' || "
    "repeat('<a href=\"http://h.test/x\">link</a>', doc_id % 3 + 1) || "
    "'</body></html>'"
)


def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-stripping text extraction: drop <script>/<style>
    blocks (non-greedy, content included), flatten remaining tags to
    spaces, decode the common entities, collapse whitespace — plus
    the link count a crawl-graph builder wants. All regexp/replace
    expressions; the whole query is one codegen'd projection."""
    d = load_table(spark, sf_dir, "documents")
    html = _html_expr()
    s = F.regexp_replace(html, r"<script[^>]*>[\s\S]*?</script>", "")
    s = F.regexp_replace(s, r"<style[^>]*>[\s\S]*?</style>", "")
    s = F.regexp_replace(s, r"<[^>]+>", " ")
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"')):
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.trim(F.regexp_replace(s, " +", " "))
    return d.select(
        "doc_id",
        F.regexp_count(html, F.lit("<a ")).cast("long").alias("n_links"),
        F.length(s).cast("long").alias("extracted_len"),
        F.size(F.filter(F.split(s, " "), lambda t: F.length(t) > 0))
        .cast("long")
        .alias("n_words"),
        F.substring(s, 1, 60).alias("sample"),
    )


HTML_EXTRACT_SQL = rf"""
WITH h AS (SELECT doc_id, {_HTML_SQL} AS html FROM documents),
x AS (
  SELECT doc_id, html,
         trim(regexp_replace(
           replace(replace(replace(replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(html, '<script[^>]*>[\s\S]*?</script>', '', 'g'),
                 '<style[^>]*>[\s\S]*?</style>', '', 'g'),
               '<[^>]+>', ' ', 'g'),
             '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
           ' +', ' ', 'g')) AS s
  FROM h
)
SELECT doc_id,
       CAST(len(regexp_extract_all(html, '<a ')) AS BIGINT) AS n_links,
       CAST(len(s) AS BIGINT) AS extracted_len,
       CAST(len(list_filter(string_split(s, ' '), t -> len(t) > 0)) AS BIGINT)
         AS n_words,
       substr(s, 1, 60) AS sample
FROM x
"""


# --- URL normalization ------------------------------------------------------


def _url_expr() -> F.Column:
    return F.concat(
        F.lit("https://WWW.Host-"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".TEST/Path/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&b="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&utm_campaign=x&a="),
        (F.col("doc_id") % 3).cast("string"),
    )


_URL_SQL = (
    "'https://WWW.Host-' || CAST(doc_id % 50 AS VARCHAR) || "
    "'.TEST/Path/' || CAST(doc_id AS VARCHAR) || "
    "'?utm_source=feed&b=' || CAST(doc_id % 7 AS VARCHAR) || "
    "'&utm_campaign=x&a=' || CAST(doc_id % 3 AS VARCHAR)"
)


def url_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL normalization — the dedup key for crawl data:
    lowercase the host (scheme/host are case-insensitive, path is
    NOT — it keeps its case), strip ``utm_*`` tracking parameters,
    sort the survivors for order-independence, reassemble. Split /
    filter / sort / join array expressions, one projection."""
    d = load_table(spark, sf_dir, "documents")
    url = _url_expr()
    host = F.lower(F.regexp_extract(url, r"^https://([^/]+)/", 1))
    path = F.regexp_extract(url, r"^https://[^/]+(/[^?]*)", 1)
    query = F.regexp_extract(url, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: ~p.startswith("utm_"),
        )
    )
    return d.select(
        "doc_id",
        host.alias("host"),
        F.size(kept).cast("long").alias("n_params_kept"),
        F.concat(
            F.lit("https://"), host, path, F.lit("?"), F.array_join(kept, "&")
        ).alias("normalized_url"),
    )


URL_NORMALIZE_SQL = rf"""
WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
p AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^https://([^/]+)/', 1)) AS host,
         regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
         list_sort(list_filter(
           string_split(regexp_extract(url, '\?(.*)$', 1), '&'),
           q -> NOT starts_with(q, 'utm_'))) AS kept
  FROM u
)
SELECT doc_id, host,
       CAST(len(kept) AS BIGINT) AS n_params_kept,
       'https://' || host || path || '?' ||
         list_aggr(kept, 'string_agg', '&') AS normalized_url
FROM p
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "html_extract_text": (html_extract_text, HTML_EXTRACT_SQL),
    "url_normalize_stats": (url_normalize_stats, URL_NORMALIZE_SQL),
}
