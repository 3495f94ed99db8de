"""Declared salted-join query (VERDICT r02 ask #8): the skew toolkit
in ``functions.skew`` graduated from tested-library-surface to a
driver-gated query.

``events.event_type`` has 5 distinct values over the whole table —
every key is a hot key, the textbook salting scenario: an unsalted
shuffle on event_type lands the entire table on 5 reducers no matter
how many executors exist. The salted join spreads each type over
``N_SALTS`` shuffle partitions (fact side salted uniformly, dim side
exploded N_SALTS×), restoring parallelism at any scale; the result is
salt-invariant, so the DuckDB oracle is the PLAIN join — the gate
hash-checks that salting does not change semantics, and the plan test
(tests/test_plans.py) checks the salt actually reaches the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.skew import SALT_COL, salted_join
from ..sources import load_table

N_SALTS = 8


def _typed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )


def _type_dim(ev: DataFrame) -> DataFrame:
    """Tiny per-type dimension (5 rows): decimal-exact mean so the
    double is bit-identical across engines."""
    return ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("type_avg")
    )


def events_salted_type_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with its type's average value through an
    8-way SALTED equi-join on the 5-hot-key event_type column, then
    re-aggregate: per type, the event count and how many events sit
    above the type average. Counts are exact ints and type_avg is
    decimal-derived, so the output hash-matches the unsalted oracle."""
    ev = _typed_events(spark, sf_dir)
    joined = salted_join(ev, _type_dim(ev), on=["event_type"], n_salts=N_SALTS)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("value") > F.col("type_avg"), 1).otherwise(0))
            .cast("long")
            .alias("n_above_avg"),
            F.first("type_avg").alias("type_avg"),
        )
        .select("event_type", "n_events", "n_above_avg", "type_avg")
    )


# The oracle is the UNSALTED join: salting must be invisible in the
# result (its whole contract).
EVENTS_SALTED_SQL = """
WITH ev AS (SELECT event_id, event_type, value FROM events),
dim AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS type_avg
  FROM ev GROUP BY event_type
)
SELECT ev.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN ev.value > dim.type_avg THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above_avg,
       ANY_VALUE(dim.type_avg) AS type_avg
FROM ev JOIN dim ON ev.event_type = dim.event_type
GROUP BY ev.event_type
"""


QUERIES = {
    "events_salted_type_join": (events_salted_type_join, EVENTS_SALTED_SQL),
}
