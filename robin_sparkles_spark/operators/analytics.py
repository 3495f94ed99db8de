"""Behavioral / product-analytics operators (EXT — the event-stream
queries an analytics engine is actually asked for: funnels, cohort
retention, and transition matrices over the ``events`` table).

These complete the events surface next to the windowed aggregations
(relational5) and the streaming twins (streaming_queries): the three
shapes every clickstream warehouse runs daily, each expressed as
shuffle-minimal DataFrame plans with exact DuckDB oracles.

Determinism rules as registry.py: no raw timestamps in outputs (epoch
seconds / day numbers instead), DECIMAL-ridden double sums, identical
aliases both dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources import load_table

# Ordered funnel definition: first view, then a click after that view,
# then a purchase after that click. `signup`/`error` events are noise
# the funnel must ignore.
FUNNEL_STEPS = ("view", "click", "purchase")


def _epoch_us(col: F.Column) -> F.Column:
    # exact integer epoch-µs of a TimestampType — unix_micros is the
    # precise twin of DuckDB's epoch_us(ts)
    return F.unix_micros(col)


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion: how many users produced a `view`,
    then a `click` strictly after their FIRST view, then a `purchase`
    strictly after that first qualifying click.

    Plan: three chained conditional-min WINDOWS over the same
    ``user_id`` partitioning (t_view, then t_click > t_view, then
    t_purchase > t_click) — one shuffle, O(1) aggregation state per
    user (no per-user event buffering, so power users with millions
    of events cost nothing extra), then a user-level groupBy that
    reuses the window's exchange, then the tiny global rollup.
    Output is the 3-row funnel summary.

    At 100 TB: the only wide exchange is the one user_id shuffle; the
    dependent-step logic is window-min arithmetic, not an
    events-to-events self-join.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch_us(F.col("ts")).alias("us")
    )
    pw = W.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(pw),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("us") > F.col("t_view")),
                    F.col("us"),
                )
            ).over(pw),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") > F.col("t_click")),
                    F.col("us"),
                )
            ).over(pw),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    agg = per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("n_view"),
        F.sum(F.when(F.col("t_click").isNotNull(), 1).otherwise(0)).alias("n_click"),
        F.sum(F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)).alias(
            "n_purchase"
        ),
    )
    step = F.stack(
        F.lit(3),
        F.lit("1_view"),
        F.col("n_view"),
        F.lit("2_click"),
        F.col("n_click"),
        F.lit("3_purchase"),
        F.col("n_purchase"),
    )
    return (
        agg.select("n_users", step.alias("step", "reached"))
        .select(
            "step",
            F.col("reached").cast("long").alias("reached"),
            (F.col("reached").cast("double") / F.col("n_users").cast("double")).alias(
                "pct_of_users"
            ),
        )
    )


EVENTS_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view
  FROM events GROUP BY user_id
),
clicks AS (
  SELECT p.user_id, MIN(epoch_us(e.ts)) AS t_click
  FROM per_user p JOIN events e ON e.user_id = p.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > p.t_view
  GROUP BY p.user_id
),
purchases AS (
  SELECT c.user_id, MIN(epoch_us(e.ts)) AS t_purchase
  FROM clicks c JOIN events e ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
  GROUP BY c.user_id
),
agg AS (
  SELECT (SELECT COUNT(*) FROM per_user) AS n_users,
         (SELECT COUNT(t_view) FROM per_user) AS n_view,
         (SELECT COUNT(*) FROM clicks) AS n_click,
         (SELECT COUNT(*) FROM purchases) AS n_purchase
)
SELECT s.step, s.reached, CAST(s.reached AS DOUBLE) / CAST(a.n_users AS DOUBLE) AS pct_of_users
FROM agg a, LATERAL (VALUES ('1_view', CAST(a.n_view AS BIGINT)),
                            ('2_click', CAST(a.n_click AS BIGINT)),
                            ('3_purchase', CAST(a.n_purchase AS BIGINT))) AS s(step, reached)
"""


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by the day of
    their first event (cohort), counted distinct on each later active
    day offset. Day numbers are exact integer epoch-days (UTC), never
    formatted dates — parity-safe across engines.

    Plan: first-seen day per user (one user_id aggregation), joined
    back onto the events scan (shuffle on user_id — same partitioning
    as the agg, so AQE reuses the exchange), then a (cohort, offset)
    count-distinct. At 100 TB the first-seen table is |users| rows —
    orders of magnitude smaller than events — and the distinct is
    bounded by users × active-days.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        # exact integral `div` (not `/`): epoch-µs exceed 2^53
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


USER_RETENTION_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
first_seen AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
)
SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
       COUNT(DISTINCT e.user_id) AS active_users
FROM ev e JOIN first_seen f USING (user_id)
GROUP BY 1, 2
"""


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov
    counts): for each consecutive pair of events of one user (ordered
    by ts, event_id as the deterministic tiebreak), count transitions
    and the within-source probability.

    Plan: one window (lag over user_id partitions — single shuffle),
    one aggregation on the (from, to) pair, one tiny window over the
    ≤ |types|² result for the row-normalized probability. The |types|²
    matrix is the only thing that leaves the aggregation. No
    self-join: lag IS the adjacency.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", _epoch_us(F.col("ts")).alias("us"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    w_norm = W.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w_norm).cast("double")).alias(
            "p"
        ),
    )


EVENTS_TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS from_type
  FROM events
),
pairs AS (
  SELECT from_type, event_type AS to_type, COUNT(*) AS n
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM pairs
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "events_funnel_conversion": (events_funnel_conversion, EVENTS_FUNNEL_SQL),
    "user_retention_cohorts": (user_retention_cohorts, USER_RETENTION_SQL),
    "events_transition_matrix": (events_transition_matrix, EVENTS_TRANSITION_SQL),
}
