"""Deterministic arithmetic hashes, expressible in both Spark SQL and
ANSI-ish SQL (DuckDB).

Why not ``xxhash64``/``hash``: those builtins exist in both engines but
with *different* algorithms/seeds, so any query whose output depends on
hash values would fail the driver's value-hash oracle gate. Instead we
use a classic polynomial rolling hash (Rabin–Karp style) and affine
"permutations" ((a·x + b) mod p) built from plain 64-bit integer
arithmetic — bit-for-bit reproducible in any engine, and still
JVM-side/codegen'd in Spark (higher-order functions, no UDFs).

All arithmetic stays below 2^62: values are reduced mod
MERSENNE_P = 2^31 − 1 and multiplied by constants < 2^31.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 − 1, prime
POLY_BASE = 31

# Affine hash-family constants: deterministic, coprime-ish multipliers
# derived from the golden-ratio multiplier (Knuth); any fixed odd
# a_i < p works. Generated as (AFFINE_A_MULT * (i+1)) mod p, forced
# odd. Exported as named constants so in-plan twins (the hashed
# projection bank in operators/similarity.py) can embed the SAME
# family without duplicating magic numbers.
AFFINE_A_MULT = 2654435761
AFFINE_B_MULT = 40503


def affine_params(i: int) -> tuple[int, int]:
    a = (AFFINE_A_MULT * (i + 1)) % MERSENNE_P
    a = a | 1
    b = (AFFINE_B_MULT * (i + 7) * (i + 13)) % MERSENNE_P
    return a, b


def poly_fingerprint(text: Column | str, base: int = POLY_BASE, mod: int = MERSENNE_P) -> Column:
    """Polynomial rolling hash of a string's characters:
    ``h = fold(chars, 0, (acc, c) -> (acc*base + codepoint(c)) % mod)``.

    Document fingerprinting (EXT — SURVEY.md §7 Phase 3a). Evaluated
    entirely by Catalyst higher-order functions (`split` → `aggregate`),
    so it scales with zero Python cost. DuckDB twin:
    ``list_reduce([0] || [ord(c) for c in chars], (a,x) -> (a*31+x)%m)``.
    """
    col = F.col(text) if isinstance(text, str) else text
    chars = F.filter(F.split(col, ""), lambda c: F.length(c) > 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(base) + F.ascii(c)) % F.lit(mod),
    )


def minhash_value(hash_col: Column, i: int, mod: int = MERSENNE_P) -> Column:
    """The i-th affine permutation of an integer hash:
    ``(a_i * h + b_i) mod p`` — one row of a MinHash signature before
    the per-document ``min`` aggregation."""
    a, b = affine_params(i)
    return (hash_col * F.lit(a) + F.lit(b)) % F.lit(mod)


def affine_sql(expr: str, i: int, mod: int = MERSENNE_P) -> str:
    """DuckDB/ANSI twin of ``minhash_value`` as a SQL fragment."""
    a, b = affine_params(i)
    return f"(({expr}) * {a} + {b}) % {mod}"


POLY_FINGERPRINT_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({col}, ''), c -> CAST(ord(c) AS BIGINT))), "
    "(acc, x) -> (acc * {base} + x) % {mod})"
)


def poly_fingerprint_sql(col: str, base: int = POLY_BASE, mod: int = MERSENNE_P) -> str:
    """DuckDB twin of ``poly_fingerprint`` as a SQL fragment."""
    return POLY_FINGERPRINT_SQL.format(col=col, base=base, mod=mod)
