"""Constant-expression rendering with a parse memo (r15 optimization).

The ANN/clustering family inlines fitted model constants (centroid
matrices, PQ codebooks, OPQ rotations) into plans. Before r15 several
sites built those constants ELEMENT-WISE with ``F.lit``/``F.array``/
``F.struct`` — every element a py4j round-trip. Profiling
``ann_ivfpq_topk`` showed 4,540 py4j commands (1.4 s of socket wall)
per plan CONSTRUCTION, ~0.8 s of it in one 8×64 coarse-probe
expression (guide §1: measure first; the cost is per invocation, so
the bench pays it on every rep and a production driver pays it on
every query compile).

The fix: render the whole constant expression to ONE SQL string
(doubles via repr→CAST — shortest-repr round-trip is exact, the same
contract ``_assign_expr`` documents) and parse it with a single
``F.expr`` call, memoized by string. Fitted constants are already
memoized per sf_dir, so the memo stays small and hits on every
invocation after the first; a Column is a pure expression tree on the
long-lived JVM gateway, so reuse across sessions in one process is
safe. Arithmetic is UNCHANGED (same fold sequence, same tie rules) —
outputs are bit-identical, only the number of py4j calls changes.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Parsed-Column memo. Keys are full SQL strings; values are reusable
# unresolved-expression Columns. Bounded in practice by the number of
# distinct fitted models per process (each fit is itself memoized).
_EXPR_MEMO: dict[str, Column] = {}


def memo_expr(sql: str) -> Column:
    col = _EXPR_MEMO.get(sql)
    if col is None:
        col = F.expr(sql)
        _EXPR_MEMO[sql] = col
    return col


def render_double(x: float) -> str:
    """Exact double literal: repr round-trips IEEE-754 exactly, and
    the CAST makes the SQL type unambiguous (a bare ``0.1`` literal
    parses as DECIMAL in Spark SQL)."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def render_double_array(values) -> str:
    return "array(" + ",".join(render_double(x) for x in values) + ")"


def dot_spark_sql(x: str, y: str) -> str:
    """Spark SQL twin of ``functions.vectors.dot`` — the identical
    zip_with multiply + left fold from double 0.0, so results are
    bit-identical to the Column form."""
    return (
        f"aggregate(zip_with({x}, {y}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def probe_cells_sql(
    cells: list[list[float]], nprobe: int, vec_col: str = "v"
) -> str:
    """The ``nprobe`` nearest cells of ``vec_col`` against literal
    centroids, as one SQL string: array of (s, c) structs →
    ``array_sort`` (score first, cell id breaks exact ties) → slice →
    project cell ids. Identical semantics to the pre-r15 element-wise
    builders ``clustering._probe_cells_expr`` / ``pq._probe_expr``
    (same score arithmetic ‖c‖² − 2⟨v,c⟩, same lexicographic struct
    sort, same slice), one ``F.expr`` parse instead of ~10·k·dim py4j
    calls."""
    structs = []
    for i, c in enumerate(cells):
        n2 = render_double(sum(x * x for x in c))
        score = (
            f"{n2} - CAST(2.0 AS DOUBLE) * "
            f"{dot_spark_sql(vec_col, render_double_array(c))}"
        )
        structs.append(f"named_struct('s', {score}, 'c', {i})")
    arr = "array(" + ",".join(structs) + ")"
    return f"transform(slice(array_sort({arr}), 1, {nprobe}), p -> p.c)"
