"""Fixed metrics schemas — the superset of sparkMeasure fields the
reference actually consumes (SURVEY.md §1.3; ComputePartitions.scala:
38-50, Listener.scala:63-64).

LongType for durations/bytes deliberately avoids the reference's lossy
``.toInt`` casts (ComputePartitions.scala:44-45): a stage that reads
more than 2 GiB or runs longer than ~25 days would overflow Int.
"""

from __future__ import annotations

from pyspark.sql import types as T

STAGE_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run", T.IntegerType(), False),
        # Spark stage ids restart at 0 per application, so stage_id is
        # only meaningful per app: the recording watermark must never
        # compare stage ids across applications (see recommend.record_run).
        T.StructField("app_id", T.StringType(), False),
        T.StructField("stage_id", T.IntegerType(), False),
        T.StructField("stage_duration_ms", T.LongType(), False),
        T.StructField("executor_cpu_time_ms", T.LongType(), False),
        T.StructField("bytes_read", T.LongType(), False),
        T.StructField("shuffle_bytes_written", T.LongType(), False),
        T.StructField("shuffle_bytes_read", T.LongType(), False),
    ]
)

TASK_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run", T.IntegerType(), False),
        T.StructField("stage_id", T.IntegerType(), False),
        T.StructField("task_id", T.LongType(), False),
        T.StructField("executor_id", T.StringType(), False),
        T.StructField("duration_ms", T.LongType(), False),
    ]
)
