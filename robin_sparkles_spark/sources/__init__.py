"""Sources: scans over the fixture tables + generic readers.

Covers SURVEY.md §2.1: S1 (text scan), S2 (in-memory), S9 (parquet
fixture scans), plus EXT ingest formats (JSONL/CSV with explicit
schemas and corrupt-record auditing — ``formats``). The metrics-store
scans (S5–S7) live in ``robin_sparkles_spark.metrics``.
"""

from .formats import (
    DOCUMENTS_SCHEMA,
    corrupt_count,
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)
from .tables import TABLES, load_table, register_views, text_corpus_df

__all__ = [
    "DOCUMENTS_SCHEMA",
    "TABLES",
    "corrupt_count",
    "load_table",
    "read_csv",
    "read_jsonl",
    "register_views",
    "text_corpus_df",
    "write_csv",
    "write_jsonl",
]
