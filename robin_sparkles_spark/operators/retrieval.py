"""Inverted-index retrieval (EXT): the posting-list build + conjunctive
term query — the search-side complement of the text-analysis family
(the shingle/band indexes dedup builds are write-side; this is the
read path a corpus service runs).

Determinism rules as registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import ws_tokens, ws_tokens_sql
from ..sources import load_table

# fixed conjunctive query over the fixture vocabulary (both terms are
# high-df domain words, so the intersection is selective but
# non-vacuous at every SF)
SEARCH_TERMS = ("table", "hash")


def docs_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) term search: documents containing BOTH
    query terms, with per-term hit counts — the posting-list
    intersection every inverted index serves.

    Plan: tokenize+explode is map-only; the term filter lands BEFORE
    the aggregation, so only the queried terms' postings shuffle
    (∝ df(term), not corpus tokens); the AND is one groupBy(doc)
    with a distinct-term count — posting intersection as hash
    aggregation, no join at all. At 100 TB a standing index would be
    the stored form of the same postings (term-bucketed parquet);
    the query plan over it is identical from the filter down."""
    postings = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(ws_tokens()).alias("term"))
        .where(F.col("term").isin(*SEARCH_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    t1, t2 = SEARCH_TERMS
    return (
        postings.groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum(F.when(F.col("term") == t1, F.col("tf")).otherwise(0)).alias("n_t1"),
            F.sum(F.when(F.col("term") == t2, F.col("tf")).otherwise(0)).alias("n_t2"),
        )
        .where(F.col("n_terms") == len(SEARCH_TERMS))
        .select("doc_id", "n_t1", "n_t2", (F.col("n_t1") + F.col("n_t2")).alias("n_hits"))
    )


def _search_sql() -> str:
    t1, t2 = SEARCH_TERMS
    return f"""
WITH postings AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id,
               unnest({ws_tokens_sql()}) AS term
        FROM documents)
  WHERE term IN ('{t1}', '{t2}')
  GROUP BY doc_id, term
)
SELECT doc_id,
       CAST(SUM(CASE WHEN term = '{t1}' THEN tf ELSE 0 END) AS BIGINT) AS n_t1,
       CAST(SUM(CASE WHEN term = '{t2}' THEN tf ELSE 0 END) AS BIGINT) AS n_t2,
       CAST(SUM(CASE WHEN term = '{t1}' THEN tf ELSE 0 END)
            + SUM(CASE WHEN term = '{t2}' THEN tf ELSE 0 END) AS BIGINT) AS n_hits
FROM postings
GROUP BY doc_id
HAVING COUNT(DISTINCT term) = {len(SEARCH_TERMS)}
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "docs_search_and": (docs_search_and, _search_sql()),
}
