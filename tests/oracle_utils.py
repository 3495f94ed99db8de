"""Local replica of the driver's DuckDB-oracle comparison so parity
breaks surface in pytest before the driver's sf0.01 gate does.

Mirrors the contract in __spark_entry__.py: row count + column-name
schema + order-insensitive exact value equality (the driver hashes
values, so floats must match bit-for-bit — no tolerances here).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd

from robin_sparkles_spark.sources import TABLES


def duckdb_connection(
    sf_dir: str, tables: tuple[str, ...] = TABLES
) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        s = out[c]
        if s.dtype == object and s.map(lambda v: isinstance(v, Decimal)).any():
            s = s.astype(float)
        elif str(s.dtype).startswith(("int", "Int", "uint", "UInt")):
            s = s.astype("int64")
        elif str(s.dtype).startswith("float"):
            s = s.astype("float64")
        out[c] = s
    cols = sorted(out.columns)
    out = out[cols]
    if len(out):
        out = out.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return out


def assert_query_matches_oracle(
    spark_df, oracle_sql, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    if callable(oracle_sql):  # lazy oracle (e.g. centroid literals)
        oracle_sql = oracle_sql(sf_dir)
    con = duckdb_connection(sf_dir, tables)
    expected = con.sql(oracle_sql).df()
    actual = spark_df.toPandas()

    assert sorted(actual.columns) == sorted(expected.columns), (
        f"schema mismatch: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )

    a, e = _normalize(actual), _normalize(expected)
    for c in a.columns:
        ak, ek = a[c].dtype.kind, e[c].dtype.kind
        # int-vs-float drift (e.g. DuckDB HUGEINT → pandas float64)
        # breaks the driver's value hash even when values are equal
        assert ak == ek or {ak, ek} <= {"O", "U"}, (
            f"col {c} dtype kind mismatch: spark={a[c].dtype} oracle={e[c].dtype}"
        )
    for c in a.columns:
        av, ev = a[c].tolist(), e[c].tolist()
        for i, (x, y) in enumerate(zip(av, ev)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"col {c} row {i}: spark={x!r} oracle={y!r}"
            else:
                assert x == y, f"col {c} row {i}: spark={x!r} oracle={y!r}"
