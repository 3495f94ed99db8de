"""Sources: scans over the fixture tables + generic readers.

Covers SURVEY.md §2.1: S1 (text scan), S2 (in-memory), S9 (parquet
fixture scans). The metrics-store scans (S5–S7) live in
``robin_sparkles_spark.metrics``.
"""

from .tables import TABLES, load_table, register_views, text_corpus_df

__all__ = ["TABLES", "load_table", "register_views", "text_corpus_df"]
