"""Reusable Column-expression builders.

Policy (SURVEY.md §2.10): every hot-path expression is built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen;
``pandas_udf`` is reserved for the few EXT operators with no builtin
equivalent, and row-at-a-time Python UDFs are banned.
"""

from .text import DEFAULT_SEPARATORS, DEFAULT_STOP_WORDS, tokens_column
from .hashing import poly_fingerprint, minhash_value

__all__ = [
    "DEFAULT_SEPARATORS",
    "DEFAULT_STOP_WORDS",
    "tokens_column",
    "poly_fingerprint",
    "minhash_value",
]
