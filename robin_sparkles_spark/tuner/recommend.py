"""Tuning lifecycle — the DataFrame rebuild of Runner.getOptimizedConf
/ Runner.run (CountingApp.scala:61-101).

Reference flow: load run history → align on the max-shuffle stage →
H8 recommendation → write ``spark.default.parallelism`` → run workload
with recording listeners → metrics persist at app end.

Engine flow (one unified path instead of the reference's split
local/cluster entry points, CountingApp.scala:17-57): Spark SQL's
shuffle width is ``spark.sql.shuffle.partitions`` and it is
session-mutable, so tuning needs no SparkContext restart — we set it
via ``spark.conf.set`` before the job and record metrics afterwards
via the REST collector.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..metrics.collector import collect_app_metrics
from ..metrics.store import MetricsStore
from .heuristics import ComputePartitions, ConfView, stages_with_most_expensive_shuffle


@dataclass
class Recommendation:
    partitions: int
    next_run_id: int
    runs_considered: int


def recommend_partitions(store: MetricsStore, conf: ConfView | None = None) -> Recommendation:
    """The getOptimizedConf core: contiguous run history → max-shuffle
    stage lineage (J2) → H8. Returns the partition count plus the id
    the next recording should use (== number of previous runs,
    CountingApp.scala:80-83)."""
    conf = conf or ConfView.from_spark(store.spark)
    history = store.run_history()
    target_stages = stages_with_most_expensive_shuffle(history)
    partitions = ComputePartitions(conf).from_stage_metric_shared_cluster(target_stages)
    return Recommendation(
        partitions=partitions, next_run_id=len(history), runs_considered=len(history)
    )


def apply_recommendation(spark: SparkSession, rec: Recommendation) -> None:
    """Conf injection, not plan rewriting (SURVEY.md §4): the SQL-side
    twin of the reference's ``conf.set("spark.default.parallelism", …)``
    (CountingApp.scala:77)."""
    spark.conf.set("spark.sql.shuffle.partitions", str(rec.partitions))


def record_run(store: MetricsStore, run_id: int) -> bool:
    """Post-job flight-record: pull this app's stage/task metrics over
    REST and persist them as ``run=run_id``. Returns False when the
    REST UI is unavailable (metrics simply not recorded, like an
    unregistered listener in the reference).

    Only stages newer than anything already in the store are recorded
    — the REST stage list is cumulative for the app, and without the
    watermark every run would re-record its predecessors' stages
    (per-run disjointness is what the reference got from fresh
    flight-recorder instances per run, Listener.scala:85-92).
    """
    from pyspark.sql import functions as F

    watermark = -1
    existing = store.stage_metrics()
    if existing.isEmpty() is False:
        row = existing.agg(F.max("stage_id")).collect()[0]
        if row[0] is not None:
            watermark = row[0]
    collected = collect_app_metrics(store.spark, since_stage_id=watermark)
    if collected is None:
        return False
    stage_rows, task_rows = collected
    if not stage_rows:
        return False
    store.write_run(run_id, stage_rows, task_rows)
    return True


def tuned_run(spark: SparkSession, metrics_root: str, app_name: str, job) -> Recommendation:
    """End-to-end tuned execution: recommend → apply → run ``job``
    (a callable taking the SparkSession) → record. The next invocation
    sees one more run of history and ratchets the recommendation —
    additive growth while improving, argmin on overshoot (H8)."""
    store = MetricsStore(spark, metrics_root, app_name)
    rec = recommend_partitions(store)
    apply_recommendation(spark, rec)
    job(spark)
    record_run(store, rec.next_run_id)
    return rec
