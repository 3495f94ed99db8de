"""Declared ingest-format queries (late r11): the JSONL / CSV scan
paths (``sources.formats``) promoted from pytest-only round-trips to
driver-gated queries — the staged corpus is written by THIS engine's
writers and read back by BOTH engines' independent readers (Spark's
schema-explicit scan vs DuckDB's read_json/read_csv), so the gate
cross-checks the format encode+decode, not just the aggregation.

JSONL is the LLM-corpus interchange standard (one document object per
line); CSV is the tabular sidecar format. Scale rules live in
``sources.formats`` (explicit schema — no inference pass; PERMISSIVE
corrupt-record capture; splittability notes); the queries here
aggregate per-source corpus stats over the scanned frame — one
shuffle, pushdown-friendly column pruning (the scan reads only the
aggregated columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table, read_csv, read_jsonl, write_csv, write_jsonl
from ..sources.staging import is_staged, staged_path


def jsonl_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "docs_jsonl_v1", "documents")


def csv_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "docs_csv_v1", "documents")


def stage_jsonl_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently write the documents table as multi-file JSONL."""
    path = jsonl_corpus_path(sf_dir)
    if not is_staged(path):
        write_jsonl(
            load_table(spark, sf_dir, "documents").repartition(4, "doc_id"),
            path,
        )
    return path


def stage_csv_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently write the documents table as quoted multi-file CSV
    (text contains commas and newlines — quoteAll keeps it RFC 4180)."""
    path = csv_corpus_path(sf_dir)
    if not is_staged(path):
        write_csv(
            load_table(spark, sf_dir, "documents").repartition(4, "doc_id"),
            path,
        )
    return path


def _corpus_stats(docs: DataFrame) -> DataFrame:
    """Per-source corpus profile over a scanned documents frame —
    exact-integer aggregates only (format fidelity is the point; a
    float mean would hash-flake before a mangled row would)."""
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.length("text")).alias("total_text_len"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.count_distinct("lang").alias("n_langs"),
    )


def jsonl_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stats over the JSONL round-trip: write (this
    engine) → schema-explicit PERMISSIVE scan (this engine) vs
    DuckDB's independent read_json (the oracle). total_text_len ==
    total_chars doubles as an in-row fidelity check (n_chars was
    derived from text at fixture build)."""
    return _corpus_stats(
        read_jsonl(spark, stage_jsonl_corpus(spark, sf_dir))
    )


def csv_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stats over the quoted-CSV round-trip (embedded
    commas/newlines in text exercise the RFC 4180 path)."""
    return _corpus_stats(read_csv(spark, stage_csv_corpus(spark, sf_dir)))


_STATS_SQL = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(length(text)) AS BIGINT) AS total_text_len,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id,
       COUNT(DISTINCT lang) AS n_langs
FROM scanned
GROUP BY source
"""


def jsonl_ingest_oracle(sf_dir: str) -> str:
    from ..session import active_or_local

    path = stage_jsonl_corpus(active_or_local("jsonl_oracle"), sf_dir)
    return f"""
WITH scanned AS (
  SELECT * FROM read_json('{path}/*.json',
    format='newline_delimited',
    columns={{doc_id: 'BIGINT', text: 'VARCHAR', lang: 'VARCHAR',
              source: 'VARCHAR', n_chars: 'BIGINT'}})
)
{_STATS_SQL}
"""


def csv_ingest_oracle(sf_dir: str) -> str:
    from ..session import active_or_local

    path = stage_csv_corpus(active_or_local("csv_oracle"), sf_dir)
    return f"""
WITH scanned AS (
  SELECT * FROM read_csv('{path}/*.csv', header=true, quote='"',
    escape='"', columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR',
    'lang': 'VARCHAR', 'source': 'VARCHAR', 'n_chars': 'BIGINT'}})
)
{_STATS_SQL}
"""


QUERIES = {
    "jsonl_ingest_stats": (jsonl_ingest_stats, jsonl_ingest_oracle),
    "csv_ingest_stats": (csv_ingest_stats, csv_ingest_oracle),
}
