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


# --- UT1-style URL/domain blocklist filter (r15 — VERDICT r14 #6) -----------
# The FIRST filter every crawl pipeline applies (the UT1/Université
# Toulouse blocklists, used verbatim by FineWeb/RefinedWeb/CCNet-class
# curation): drop documents whose URL's domain — or ANY parent domain,
# UT1 entries block whole subtrees — appears on a categorized
# blocklist, and account for survival per source so the curation
# report shows what the list cost each slice.
#
# Deterministic fixture blocklist over the _url_expr host universe
# (host-0..host-49): every K % 10 == 3 registered domain is "adult",
# every K % 10 == 7 is "gambling", plus ONE exact-host entry
# ("www.host-1.test" → "tracker") so the subtree-vs-exact matching
# distinction is exercised — a registered-domain entry catches the
# www. subdomain, the exact entry catches only itself.
BLOCK_CATEGORIES = ("adult", "gambling", "tracker")
URL_BLOCKLIST: tuple[tuple[str, str], ...] = tuple(
    sorted(
        [(f"host-{k}.test", "adult") for k in range(50) if k % 10 == 3]
        + [(f"host-{k}.test", "gambling") for k in range(50) if k % 10 == 7]
        + [("www.host-1.test", "tracker")]
    )
)


def url_unblocked_expr() -> F.Column:
    """Map-only per-row verdict: True iff NO host suffix matches any
    blocklist domain — provably ``url_blocked_docs().category IS
    NULL`` (``min(category)`` over the left-joined suffix explode is
    NULL exactly when no suffix equi-matched a blocklist row; the
    overlap test decides the same membership without the explode, the
    broadcast join, or the per-doc re-aggregation). Used by
    ``curation.curation_funnel`` to ride its base documents scan with
    ZERO shuffle (r15 optimization, guide §2.4).
    ``docs_url_blocklist_filter`` keeps the broadcast equi-join form,
    which is the right shape for arbitrary-size blocklists (UT1 ~4M
    rows) and also needs the category value, not just the verdict."""
    url = _url_expr()
    host = F.lower(F.regexp_extract(url, r"^https://([^/]+)/", 1))
    labels = F.split(host, r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(2), F.size(labels)),
        lambda L: F.array_join(F.slice(labels, -L, L), "."),
    )
    blocked = F.array(*[F.lit(d) for d, _ in URL_BLOCKLIST])
    return ~F.arrays_overlap(suffixes, blocked)


def url_blocked_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc blocklist verdict — (doc_id, source, category) with
    category NULL for unblocked docs. The shared candidate stage of
    ``docs_url_blocklist_filter`` and ``curation_funnel`` (factored
    r15 — pure code motion, the filter query re-gates this round
    anyway as a new query)."""
    d = load_table(spark, sf_dir, "documents")
    url = _url_expr()
    host = F.lower(F.regexp_extract(url, r"^https://([^/]+)/", 1))
    labels = F.split(host, r"\.")
    suffixes = F.expr(
        "transform(sequence(2, size(labels)), "
        "L -> array_join(slice(labels, -L, L), '.'))"
    )
    exploded = (
        d.select("doc_id", "source", labels.alias("labels"))
        .select("doc_id", "source", F.explode(suffixes).alias("suffix"))
    )
    bl = spark.createDataFrame(
        list(URL_BLOCKLIST), "domain string, category string"
    )
    return (
        exploded.join(
            F.broadcast(bl), exploded.suffix == bl.domain, "left"
        )
        .groupBy("doc_id", "source")
        .agg(F.min("category").alias("category"))
    )


# the per-doc verdict CTE shared by the filter oracle and the funnel
# oracle — must stay term-for-term identical to url_blocked_docs
_URL_BLOCKED_PERDOC_SQL = rf"""
ex AS (
  SELECT doc_id, source,
         array_to_string(list_slice(labels, len(labels) - L + 1, len(labels)),
                         '.') AS suffix
  FROM (SELECT doc_id, source, labels,
               unnest(generate_series(2, len(labels))) AS L
        FROM (
          SELECT doc_id, source,
                 string_split(lower(regexp_extract({_URL_SQL},
                              '^https://([^/]+)/', 1)), '.') AS labels
          FROM documents
        ))
),
bl(domain, category) AS (VALUES __BLOCKLIST_VALUES__),
per_doc AS (
  SELECT doc_id, source, MIN(category) AS category
  FROM ex LEFT JOIN bl ON ex.suffix = bl.domain
  GROUP BY doc_id, source
)
"""


def docs_url_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source survival accounting under the domain blocklist:
    (source, n_docs, n_blocked, n_kept, blocked_<category>...,
    block_rate).

    Matching semantics (UT1): an entry blocks the domain AND every
    subdomain, so each host expands to its ≥2-label suffix chain
    (``www.host-3.test`` → [``host-3.test``, ``www.host-3.test``]) and
    matches by equi-join. A doc matching several entries takes the
    lexicographically first category (deterministic in both engines).

    Scale shape: the suffix explode is bounded by label count (≤ ~5
    real-world), the blocklist is BROADCAST (UT1 is ~4M rows ≈ 10²
    MB — the canonical broadcast dim), the match is a map-side hash
    join, and the only shuffles are the per-doc min-category
    aggregation (doc_id-keyed, partial-aggregating) and the tiny
    per-source rollup. No window, no self-join, no Python."""
    per_doc = url_blocked_docs(spark, sf_dir)
    blocked = F.col("category").isNotNull()
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(blocked.cast("long")).alias("n_blocked"),
            *[
                F.sum(
                    F.when(F.col("category") == c, 1).otherwise(0)
                ).cast("long").alias(f"blocked_{c}")
                for c in BLOCK_CATEGORIES
            ],
        )
        .select(
            "source",
            "n_docs",
            "n_blocked",
            (F.col("n_docs") - F.col("n_blocked")).alias("n_kept"),
            *[f"blocked_{c}" for c in BLOCK_CATEGORIES],
            (
                F.col("n_blocked").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("block_rate"),
        )
    )


_BLOCKLIST_SQL = ", ".join(f"('{d}', '{c}')" for d, c in URL_BLOCKLIST)
_BLOCKED_CAT_SQL = ",\n       ".join(
    f"CAST(SUM(CASE WHEN category = '{c}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS blocked_{c}"
    for c in BLOCK_CATEGORIES
)

URL_BLOCKLIST_SQL = rf"""
WITH {_URL_BLOCKED_PERDOC_SQL.replace("__BLOCKLIST_VALUES__", _BLOCKLIST_SQL)}
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN category IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocked,
       COUNT(*) - CAST(SUM(CASE WHEN category IS NOT NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_kept,
       {_BLOCKED_CAT_SQL},
       CAST(SUM(CASE WHEN category IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS block_rate
FROM per_doc
GROUP BY source
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "html_extract_text": (html_extract_text, HTML_EXTRACT_SQL),
    "url_normalize_stats": (url_normalize_stats, URL_NORMALIZE_SQL),
    "docs_url_blocklist_filter": (docs_url_blocklist_filter, URL_BLOCKLIST_SQL),
}
