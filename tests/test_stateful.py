"""applyInPandasWithState operator: final state must equal the batch
aggregation over the same data (micro-batched with maxFilesPerTrigger
the fixture arrives as one batch; cents-state keeps sums exact
regardless of batch split)."""

from __future__ import annotations

from pyspark.sql import functions as F

from robin_sparkles_spark.sources import load_table
from robin_sparkles_spark.streaming.events import events_stream
from robin_sparkles_spark.streaming.stateful import user_profile_stream


def test_stateful_profile_equals_batch(spark, sf_dir):
    out = user_profile_stream(events_stream(spark, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("t_profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode can emit a row per key per batch — keep the last
    got = {
        r.user_id: (r.n_events, r.total_spend)
        for r in spark.sql(
            """SELECT user_id, n_events, total_spend FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM t_profiles) WHERE rn = 1"""
        ).collect()
    }
    batch = {
        r.user_id: (r.n, round(r.s, 2))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert got.keys() == batch.keys()
    for uid, (n, spend) in batch.items():
        g_n, g_spend = got[uid]
        assert g_n == n
        assert abs(g_spend - spend) < 0.005  # cents-exact


def test_transform_with_state_alerts_equal_batch(spark, sf_dir):
    """transformWithStateInPandas spend alerts must equal the declared
    batch twin row-for-row (the fixture replays in event-time order,
    so the stream's per-batch cumsum matches the batch window
    exactly), and be non-vacuous. Skips (loudly) where the worker's
    protobuf dependency is absent — this container — in which case
    the alert arithmetic is still verified through the batch twin's
    driver-gated oracle."""
    import pytest

    from robin_sparkles_spark.operators.streaming_queries import events_spend_alerts
    from robin_sparkles_spark.streaming.stateful2 import (
        has_transform_with_state_runtime,
        spend_alert_stream,
    )

    if not has_transform_with_state_runtime():
        # Dated xfail, not skip (VERDICT r6 ask #5): a vendored-minimal
        # protobuf was evaluated 2026-08-14 and rejected — pyspark's
        # transformWithState worker imports generated *_pb2 modules
        # whose runtime (descriptor pool, message factory, wire codec)
        # is the full google.protobuf package, not a shim surface; the
        # container bans pip install. Exact probe failure, pinned:
        #   from google.protobuf import descriptor
        #   -> ModuleNotFoundError: No module named 'google'
        # On a standard Spark 4 install the stream path runs unchanged;
        # the alert arithmetic stays verified through the batch twin's
        # driver-gated oracle (events_spend_alerts).
        pytest.xfail(
            "container lacks google.protobuf (ModuleNotFoundError: No "
            "module named 'google'; pinned 2026-08-14) — "
            "transformWithStateInPandas worker cannot start"
        )

    out = spend_alert_stream(events_stream(spark, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("t_alerts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.event_id, r.level, round(r.total_spend, 2))
        for r in spark.sql("SELECT * FROM t_alerts").collect()
    }
    want = {
        (r.user_id, r.event_id, r.level, round(r.total_spend, 2))
        for r in events_spend_alerts(spark, sf_dir).collect()
    }
    assert want, "alert threshold must fire on the fixture"
    assert got == want
