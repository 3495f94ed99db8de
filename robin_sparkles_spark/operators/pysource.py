"""Declared queries over the custom Python DataSource (EXT — see
sources/pydatasource.py). The generator is a pure function of the row
id, so the DuckDB oracle reproduces the whole stream from ``range()``
— the gate checks the source's planner integration end-to-end (schema,
partitioning, generation) against independent SQL.

``sf_dir`` is accepted for registry uniformity but unused: the source
is scale-independent by construction (same status as the planted
decode fixtures)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.pydatasource import (
    DEFAULT_ROWS,
    N_TYPES,
    SOURCE_NAME,
    VALUE_MOD,
    VALUE_MULT,
    register,
)


def pysource_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type count + value sum over the Python-source scan: the
    scan parallelizes across the source's declared partitions (an
    8-way InputPartition split), then one hash aggregation. Exact
    long arithmetic throughout — the oracle regenerates the stream
    with DuckDB range() and must hash-match."""
    register(spark)
    ev = spark.read.format(SOURCE_NAME).load()
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("value_sum"),
        F.min("event_id").alias("first_id"),
        F.max("event_id").alias("last_id"),
    )


PYSOURCE_AGG_SQL = f"""
WITH g AS (SELECT range AS event_id FROM range(0, {DEFAULT_ROWS})),
ev AS (
  SELECT event_id,
         'type_' || CAST(event_id % {N_TYPES} AS VARCHAR) AS event_type,
         (event_id * {VALUE_MULT}) % {VALUE_MOD} AS value
  FROM g
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(value) AS BIGINT) AS value_sum,
       CAST(MIN(event_id) AS BIGINT) AS first_id,
       CAST(MAX(event_id) AS BIGINT) AS last_id
FROM ev
GROUP BY event_type
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "pysource_events_agg": (pysource_events_agg, PYSOURCE_AGG_SQL),
}
