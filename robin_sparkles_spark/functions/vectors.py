"""Vector (embedding) column expressions — cosine similarity and
friends over ``array<float>`` columns, built on Catalyst higher-order
functions (`zip_with` → `aggregate` fold), no UDFs.

Determinism contract (why this exact shape): the fold accumulates
left-to-right from 0.0 with every element cast to double *before*
multiplication. DuckDB's twin (``list_reduce`` over the same
per-index products) performs the identical IEEE-754 operation
sequence, so cosine values are bit-exact across engines — the oracle
gate hashes raw doubles, no rounding slack.

Scale: a 64-dim fold is ~130 double ops per pair; brute-force top-k is
quadratic in rows and is the *baseline* — the LSH-bucketed variant in
operators/similarity.py is the 100 TB path.

Negative result worth keeping (measured, Spark 4.1, local[32], sf0.1):
statically unrolling the fold into 64 ``element_at``/``get`` terms —
hoping to trade interpreted HOF lambdas for whole-stage codegen — is
~3× SLOWER on the all-pairs join (fold 28 s, element_at 81 s, get
67 s) and ~2.5× slower even as a plain projection (0.19 s vs 0.48 s
per unit-normalize pass). Likely cause: the 300-node expression tree
defeats codegen/JIT (huge generated method) and per-call element_at
overhead exceeds the fold's per-element cost. Do not retry; the HOF
fold is the fast shape for fixed-width vector math in this engine."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via sequential left fold (order-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (cast first with
    ``as_double`` when the source is array<float>)."""
    return dot(a, b) / (norm(a) * norm(b))


def normalized(vec: Column) -> Column:
    """Unit-normalize a double array: x / ‖v‖ per element. Pair scans
    should join *pre-normalized* vectors (behind an aggregation
    barrier) so each pair pays one dot product, not two norms — see
    operators/similarity.py."""
    n = norm(vec)
    return F.transform(vec, lambda x: x / n)


def dot_sql(x: str, y: str) -> str:
    """DuckDB twin of ``dot`` (1-based list indexing): identical
    multiply/add sequence → bit-identical doubles."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, len({x})), i -> {x}[i] * {y}[i])), "
        f"(acc, v) -> acc + v)"
    )


def normalized_sql(v: str) -> str:
    """DuckDB twin of ``normalized``."""
    return f"list_transform({v}, x -> x / sqrt({dot_sql(v, v)}))"


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin of ``cosine``: identical operation sequence →
    bit-identical doubles."""
    return f"({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"
