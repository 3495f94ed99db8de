"""Grouped-map (``applyInPandas``) operator — the per-group pandas
escape hatch for logic Spark's aggregates/windows can't express
(model scoring per key, per-group curve fitting, `pd.merge_asof`…).

Demonstrated with per-user event z-scores. This particular computation
IS window-expressible — deliberately, so the test can prove the
grouped-map plumbing against a pure-Catalyst twin — but the shape
(whole group in one pandas frame, arbitrary Python over it, same or
different cardinality out) is the general one.

Scale notes: one shuffle on the group key; each group must fit in one
executor's memory as a pandas frame — the operator for bounded-size
keys (users, sessions), NOT for whale keys (use windows or salting
there). Arrow-batched transfer, never row-at-a-time.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources import load_table

ZSCORE_SCHEMA = "user_id long, event_id long, value double, zscore double"


def user_event_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event values via applyInPandas."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["value"].mean()
        # population std (ddof=0) matches var_pop/stddev_pop
        std = pdf["value"].std(ddof=0)
        z = (pdf["value"] - mean) / std if std > 0 else pdf["value"] * 0.0
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "zscore": z,
            }
        )

    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return e.groupBy("user_id").applyInPandas(per_user, schema=ZSCORE_SCHEMA)


def user_event_zscores_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Catalyst twin: the same z-scores via window aggregates —
    what the test checks the grouped-map against (and the form to
    prefer when the logic IS expressible: no Python, no group-fits-
    in-memory constraint)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    w = W.partitionBy("user_id")
    mean = F.avg("value").over(w)
    std = F.stddev_pop("value").over(w)
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.when(std > 0, (F.col("value") - mean) / std).otherwise(0.0).alias("zscore"),
    )
