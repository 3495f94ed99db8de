"""Batch twins of the streaming aggregations (SURVEY.md §7 Phase 4).

Each function applies the *same* window expressions as
``streaming.events`` to the batch events scan — DuckDB oracles check
these, and tests/test_streaming.py asserts stream output == batch
output, so the streaming operators are transitively oracle-checked
(DuckDB can't stream; this is the strongest check available, and the
driver sees full hash-matches for the batch twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W

from pyspark.sql import functions as F

from ..sources import load_table
from ..streaming.events import (
    attribution_join_stream,
    cohort_enriched_stream,
    session_window_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)


def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1 h count/sum per event_type (batch twin of the
    streaming tumbling aggregation — identical expressions)."""
    return tumbling_counts_stream(load_table(spark, sf_dir, "events"))


EVENTS_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def events_sliding_30_15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 30 min / 15 min windows (batch twin)."""
    return sliding_counts_stream(load_table(spark, sf_dir, "events"))


# A 30/15 sliding window assigns each event to exactly two windows:
# the 15-min bucket it falls in and the previous one.
EVENTS_SLIDING_SQL = """
WITH buckets AS (
  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS window_start, event_type FROM events
  UNION ALL
  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000 - 900000000) AS window_start, event_type FROM events
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M') AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM buckets
GROUP BY 1, 2
"""


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, batch twin of session_window_stream.

    Computed with the built-in ``session_window`` (works in batch
    too); the oracle reproduces the sessions with gaps-and-islands
    (lag + cumulative sum over the ≥gap breaks), which is also the
    classic batch sessionization shape at scale — one window over
    (user_id, ts), no state store."""
    return session_window_stream(load_table(spark, sf_dir, "events"))


USER_SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM islands
GROUP BY user_id, session_id
"""


def view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: purchases
    attributed to same-user views within the preceding 30 minutes
    (identical expressions — ``attribution_join_stream`` on the batch
    scan; withWatermark is a no-op in batch)."""
    events = load_table(spark, sf_dir, "events")
    return attribution_join_stream(
        events.where(F.col("event_type") == "view"),
        events.where(F.col("event_type") == "purchase"),
    )


VIEW_PURCHASE_SQL = """
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_time,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
       p.value
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 30 MINUTE
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
"""


QUERIES = {
    "events_tumbling_1h": (events_tumbling_1h, EVENTS_TUMBLING_SQL),
    "events_sliding_30_15": (events_sliding_30_15, EVENTS_SLIDING_SQL),
    "user_sessions": (user_sessions, USER_SESSIONS_SQL),
}

# Post-gate-cap additions (registry enumerates *_TAIL dicts after every
# module's QUERIES, keeping the driver's 50-row gate window stable).
def view_purchase_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream interval join: every
    view with its attributed purchase, or sentinels when none followed
    within 30 minutes (``attribution_join_stream_outer`` on the batch
    scan — withWatermark is a no-op in batch, sentinels replace the
    outer join's NULLs for oracle hashability)."""
    from ..streaming.events import attribution_join_stream_outer

    events = load_table(spark, sf_dir, "events")
    return attribution_join_stream_outer(
        events.where(F.col("event_type") == "view"),
        events.where(F.col("event_type") == "purchase"),
    )


VIEW_PURCHASE_OUTER_SQL = """
SELECT v.user_id,
       v.event_id AS view_id,
       COALESCE(p.event_id, -1) AS purchase_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_time,
       COALESCE(strftime(p.ts, '%Y-%m-%d %H:%M:%S'), '') AS purchase_time,
       COALESCE(p.value, 0.0) AS value
FROM (SELECT * FROM events WHERE event_type = 'view') v
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 30 MINUTE
"""


def events_cohort_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (batch twin): events mapped to a
    cohort (user_id % 25) and enriched against the broadcast nation
    dim, aggregated per cohort name. Same expressions as
    ``streaming.events.cohort_enriched_stream``."""
    return cohort_enriched_stream(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "nation")
    )


EVENTS_COHORT_SQL = """
SELECT n.n_name AS cohort_name,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY 1
"""


def events_spend_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming.stateful2.spend_alert_stream``
    (transformWithStateInPandas): per-user cumulative spend in exact
    integer cents (DECIMAL(18,2) × 100 — the batch equivalent of the
    processor's cents ValueState), one alert row per crossing of each
    ALERT_THRESHOLD_CENTS multiple. One window over user_id — the
    same single-shuffle cumsum shape as the running-spend query; the
    crossing test is integer div arithmetic, exact in both engines."""
    from ..streaming.stateful2 import ALERT_THRESHOLD_CENTS

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    t = ALERT_THRESHOLD_CENTS
    return (
        ev.withColumn("cum", F.sum("cents").over(w))
        .where(
            F.expr(f"cum div {t}") > F.expr(f"(cum - cents) div {t}")
        )
        .select(
            "user_id",
            "event_id",
            F.expr(f"cum div {t}").alias("level"),
            (F.col("cum") / F.lit(100.0)).alias("total_spend"),
        )
    )


def _spend_alerts_sql() -> str:
    from ..streaming.stateful2 import ALERT_THRESHOLD_CENTS as t

    return f"""
WITH c AS (
  SELECT user_id, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM events
)
SELECT user_id, event_id, CAST(cum // {t} AS BIGINT) AS level,
       CAST(cum AS DOUBLE) / 100.0 AS total_spend
FROM c WHERE cum // {t} > (cum - cents) // {t}
"""


QUERIES_TAIL = {
    "events_spend_alerts": (events_spend_alerts, _spend_alerts_sql()),
    "events_cohort_enriched": (events_cohort_enriched, EVENTS_COHORT_SQL),
    "view_purchase_attribution": (view_purchase_attribution, VIEW_PURCHASE_SQL),
    "view_purchase_attribution_outer": (
        view_purchase_attribution_outer,
        VIEW_PURCHASE_OUTER_SQL,
    ),
}
