"""Time-series smoothing (EXT): bounded-history exponentially
weighted moving average per user — the classic online smoother, made
gate-checkable by truncating the kernel to a fixed window so both
engines run the *identical* finite fold.

Why bounded history: true EWMA is an unbounded recurrence
(state = all history), which in SQL terms means either a recursive
CTE or a running fold — and at 100 TB, per-key state that grows with
history is exactly what kills a job (the rolling-anomaly module's
lesson). Truncating at {EWMA_HISTORY} steps changes the value by at
most (1−α)^{EWMA_HISTORY} ≈ 1e−6 of the oldest excluded sample (α=0.5
⇒ 2⁻²⁰) while making the state a fixed-size ROWS frame — the same
trade `percentile_approx` makes for quantiles. Production streaming
form: `applyInPandasWithState` carrying one double per key
(`streaming/stateful.py`); this is its exact batch twin.

Determinism: the fold is a LEFT fold over the frame-ordered value
list with α = 0.5 (exact in binary); each step is two multiplies and
one add in the same order in both engines — bit-identical, no libm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources import load_table

EWMA_ALPHA = 0.5  # exact binary fraction — every step bit-deterministic
EWMA_HISTORY = 20  # frame length; truncation error ≤ 2^-20 of excluded mass


def events_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of purchase values over each user's last
    {EWMA_HISTORY} purchases (bounded-history smoother; see module
    docstring for the truncation argument).

    Plan: one shuffle (user_id window), `collect_list` over a fixed
    ROWS frame (≤ {EWMA_HISTORY} doubles per row — bounded state, not
    per-user history), then a Catalyst `aggregate` fold seeded with
    the oldest frame value. No Python, no self-join, no recursion.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts")).alias("us"),
            F.col("value").alias("v"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(EWMA_HISTORY - 1), 0)
    )
    return (
        ev.withColumn("hist", F.collect_list("v").over(w))
        .select(
            "user_id",
            "event_id",
            "v",
            F.expr(
                "aggregate(slice(hist, 2, size(hist) - 1), hist[0], "
                "(acc, x) -> acc * 0.5D + x * 0.5D)"
            ).alias("ewma"),
        )
    )


EVENTS_EWMA_SQL = f"""
WITH pur AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value AS v
  FROM events WHERE event_type = 'purchase'
),
framed AS (
  SELECT user_id, event_id, v,
         list(v) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN {EWMA_HISTORY - 1} PRECEDING
                                AND CURRENT ROW) AS hist
  FROM pur
)
SELECT user_id, event_id, v,
       list_reduce(hist, (acc, x) -> acc * CAST(0.5 AS DOUBLE)
                                     + x * CAST(0.5 AS DOUBLE)) AS ewma
FROM framed
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "events_ewma_value": (events_ewma_value, EVENTS_EWMA_SQL),
}
