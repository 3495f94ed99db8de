"""Cross-run partition tuner — the reference's core capability
(ComputePartitions.scala, CountingApp.scala:61-84) rebuilt on
DataFrames.

Spark's AQE already handles *within-query* partition sizing; what the
reference adds — and what this package preserves — is *cross-run*
learning: record stage/task metrics per application run, summarize
them, and recommend the shuffle partition count for the next run.
"""

from .heuristics import (
    ConfView,
    ShuffleSize,
    StageInfo,
    ComputePartitions,
    stages_with_most_expensive_shuffle,
)

__all__ = [
    "ConfView",
    "ShuffleSize",
    "StageInfo",
    "ComputePartitions",
    "stages_with_most_expensive_shuffle",
]
