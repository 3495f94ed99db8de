"""Run-partitioned stage/task metrics store (SURVEY.md §1.3, D3).

The reference persisted Java-serialized sparkMeasure ListBuffers per
run (Listener.scala:16-57); we persist Parquet partitioned by ``run``
— the reference's ``run=$n`` path layout was literally Hive partition
naming already, so the idiomatic upgrade is a 1:1 mapping that gains
partition pruning, schema evolution, and DataFrame reads.
"""

from .schema import STAGE_METRICS_SCHEMA, TASK_METRICS_SCHEMA
from .store import MetricsStore
from .collector import collect_app_metrics

__all__ = [
    "STAGE_METRICS_SCHEMA",
    "TASK_METRICS_SCHEMA",
    "MetricsStore",
    "collect_app_metrics",
]
