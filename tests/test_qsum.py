"""functions.qsum: the exact-quantized sum must agree bit-for-bit
with a pure-Python reference AND with DuckDB's evaluation of its SQL
twin over full-mantissa doubles — the regime where a fractional
double→decimal cast measurably diverges between engines (88/200k at
DECIMAL(38,4), 1e9 magnitude; see the module docstring).
"""

from __future__ import annotations

import math
import random

import duckdb
from pyspark.sql import functions as F

from robin_sparkles_spark.functions.qsum import qsum, qsum_sql

N = 50_000


def _vals(seed: int, lo: float, hi: float) -> list[float]:
    rng = random.Random(seed)
    return [rng.uniform(lo, hi) for _ in range(N)]


def _py_qsum(vals: list[float], bits: int) -> float:
    scale = float(2**bits)
    return float(sum(int(math.floor(v * scale)) for v in vals)) * (2.0**-bits)


def test_qsum_matches_python_and_duckdb_exactly(spark):
    for seed, lo, hi, bits in ((1, 0.0, 1e9, 4), (2, 0.0, 300.0, 24), (3, -1.0, 1.0, 30)):
        vals = _vals(seed, lo, hi)
        got_spark = (
            spark.createDataFrame([(v,) for v in vals], "v double")
            .agg(qsum(F.col("v"), bits).alias("s"))
            .collect()[0]
            .s
        )
        got_duck = duckdb.sql(
            f"SELECT {qsum_sql('v', bits)} AS s FROM (SELECT unnest(?) AS v)",
            params=[vals],
        ).fetchone()[0]
        ref = _py_qsum(vals, bits)
        assert got_spark == ref, (seed, bits)
        assert got_duck == ref, (seed, bits)


def test_qsum_error_bound(spark):
    """Quantization bias is one-sided and bounded: 0 ≤ Σv − qsum ≤ n·2^-bits."""
    vals = _vals(9, 0.0, 100.0)
    bits = 20
    got = (
        spark.createDataFrame([(v,) for v in vals], "v double")
        .agg(qsum(F.col("v"), bits).alias("s"))
        .collect()[0]
        .s
    )
    exact = math.fsum(vals)
    assert 0.0 <= exact - got <= N * 2.0**-bits + 1e-6
