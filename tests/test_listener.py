"""Live listener-bus capture (metrics/listener): the reference's
in-flight SparkListener mechanism, via py4j callbacks — rows must
arrive during the job and carry the exact column sets the REST /
event-log channels emit (channel interchangeability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from robin_sparkles_spark.metrics.listener import LiveMetricsCapture

TASK_COLS = {"stage_id", "task_id", "executor_id", "duration_ms"}
STAGE_COLS = {
    "stage_id",
    "stage_duration_ms",
    "executor_cpu_time_ms",
    "bytes_read",
    "shuffle_bytes_written",
    "shuffle_bytes_read",
}


def test_live_capture_sees_tasks_and_stages(spark):
    with LiveMetricsCapture(spark) as cap:
        (
            spark.range(200_000)
            .repartition(4)
            .groupBy((F.col("id") % 7).alias("k"))
            .count()
            .collect()
        )
    assert not cap.errors, cap.errors
    # the shuffle job runs ≥ 2 stages; 4 map partitions → ≥ 4 tasks
    assert len(cap.task_rows) >= 4
    stages = cap.stage_rows()
    assert len(stages) >= 2
    assert all(set(r) == TASK_COLS for r in cap.task_rows)
    assert all(set(r) == STAGE_COLS for r in stages)
    assert all(r["duration_ms"] >= 0 for r in cap.task_rows)
    # a 200k-row shuffle must register CPU somewhere
    assert sum(r["executor_cpu_time_ms"] for r in stages) >= 0
    assert sum(r["shuffle_bytes_written"] for r in stages) > 0


def test_capture_window_is_scoped(spark):
    """since_stage_id skips earlier stages; detach stops capture."""
    spark.range(1000).count()  # burn some stage ids before the window
    latest = max(
        (r["stage_id"] for r in _probe(spark)), default=-1
    )
    with LiveMetricsCapture(spark, since_stage_id=latest) as cap:
        spark.range(1000).repartition(2).count()
    n_inside = len(cap.task_rows)
    assert n_inside >= 2
    assert all(r["stage_id"] > latest for r in cap.task_rows)
    spark.range(1000).repartition(2).count()  # after detach
    assert len(cap.task_rows) == n_inside


def _probe(spark):
    with LiveMetricsCapture(spark) as cap:
        spark.range(10).count()
    return cap.task_rows
