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


# --- BM25-shaped ranked retrieval (r9) --------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20


def docs_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive (OR) ranked search: documents containing ANY query
    term, scored with the BM25 shape — per-term
    ``idf_r · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`` — where
    ``idf_r = (N − df + 0.5)/(df + 0.5)`` is the Robertson idf
    WITHOUT the log (the gate hashes raw doubles and libm log is not
    bit-portable across engines; the rational form preserves each
    term's df ordering and keeps every arithmetic step an IEEE
    operation both engines perform identically — the declared
    contract, documented as a variant).

    Plan: postings filter lands before any shuffle (∝ df, not corpus
    tokens); df and the (N, avgdl) scalars are tiny broadcast sides;
    per-doc score adds the per-term columns in fixed order; the final
    rank is ORDER BY + LIMIT → TakeOrderedAndProject (per-partition
    heads, no global sort). At 100 TB this is the standing-index
    query shape: stored postings replace the tokenize, everything
    from the filter down is identical."""
    t1, t2 = SEARCH_TERMS
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", ws_tokens().alias("ws")
    )
    lens = d.select("doc_id", F.size("ws").alias("dl"))
    stats = lens.agg(
        F.count("*").cast("double").alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count("*").cast("double")
        ).alias("avgdl"),
    )
    postings = (
        d.select("doc_id", F.explode("ws").alias("term"))
        .where(F.col("term").isin(*SEARCH_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = postings.groupBy("term").agg(
        F.count_distinct("doc_id").cast("double").alias("df")
    )

    def term_score(term: str) -> F.Column:
        tf = F.sum(
            F.when(F.col("term") == term, F.col("tf")).otherwise(0)
        ).cast("double")
        df_t = F.first(
            F.when(F.col("term") == term, F.col("df")), ignorenulls=True
        )
        idf = (F.col("n_docs") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
        )
        return F.when(
            tf > 0, idf * (tf * F.lit(BM25_K1 + 1.0)) / denom
        ).otherwise(F.lit(0.0))

    scored = (
        postings.join(F.broadcast(dfs), "term")
        .join(F.broadcast(lens), "doc_id")
        .crossJoin(F.broadcast(stats))  # 1-row scalar (sanctioned shape)
        .groupBy("doc_id", "dl", "n_docs", "avgdl")
        .agg(
            term_score(t1).alias("s1"),
            term_score(t2).alias("s2"),
            F.sum("tf").cast("long").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_hits",
            (F.col("s1") + F.col("s2")).alias("score"),
        )
    )
    return scored.orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(BM25_TOP)


def _bm25_sql() -> str:
    t1, t2 = SEARCH_TERMS

    def term_score(term: str) -> str:
        tf = f"CAST(SUM(CASE WHEN term = '{term}' THEN tf ELSE 0 END) AS DOUBLE)"
        df_t = f"MAX(CASE WHEN term = '{term}' THEN df END)"
        idf = f"((n_docs - {df_t} + 0.5) / ({df_t} + 0.5))"
        denom = (
            f"({tf} + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * "
            f"CAST(dl AS DOUBLE) / avgdl))"
        )
        return (
            f"CASE WHEN {tf} > 0 THEN {idf} * ({tf} * {BM25_K1 + 1.0}) "
            f"/ {denom} ELSE 0.0 END"
        )

    return f"""
WITH d AS (SELECT doc_id, {ws_tokens_sql()} AS ws FROM documents),
lens AS (SELECT doc_id, len(ws) AS dl FROM d),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                 CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
          FROM lens),
postings AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(ws) AS term FROM d)
  WHERE term IN ('{t1}', '{t2}')
  GROUP BY doc_id, term
),
dfs AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        FROM postings GROUP BY term),
scored AS (
  SELECT p.doc_id,
         CAST(SUM(tf) AS BIGINT) AS n_hits,
         ({term_score(t1)}) + ({term_score(t2)}) AS score
  FROM postings p
  JOIN dfs USING (term)
  JOIN lens USING (doc_id)
  CROSS JOIN stats
  GROUP BY p.doc_id, dl, n_docs, avgdl
)
SELECT doc_id, n_hits, score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {BM25_TOP}
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "docs_search_and": (docs_search_and, _search_sql()),
    "docs_search_bm25": (docs_search_bm25, _bm25_sql()),
}
