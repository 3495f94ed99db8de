"""Streaming ingestion for the metrics store (EXT — SURVEY.md §1.1
D3): "collect metrics as runs happen" is the natural streaming
generalization of the reference's flight-recorder-then-read-back batch
pattern (Listener.scala:51-57).

A Structured Streaming file source watches the store's
``stage_metrics`` directory; each new ``run=N`` partition that lands
becomes a micro-batch, and the rolling per-run summary stays current
without re-reading history. At cluster scale this is how a fleet of
applications feeds one shared tuning store: every app writes its run
partition; one streaming summarizer maintains the recommendation
inputs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..metrics.schema import STAGE_METRICS_SCHEMA
from ..metrics.store import MetricsStore


def stage_metrics_stream(
    spark: SparkSession, store: MetricsStore, max_files_per_trigger: int = 16
) -> DataFrame:
    """Stream of stage-metric rows as run partitions land. The ``run``
    partition column is recovered from the directory name via
    ``basePath`` (Hive-style discovery works for file streams too)."""
    return (
        spark.readStream.schema(STAGE_METRICS_SCHEMA)
        .option("basePath", store.stage_path)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(store.stage_path + "/run=*")
    )


def rolling_run_summary(stage_stream: DataFrame) -> DataFrame:
    """Rolling per-run rollup of the tuner's inputs: stage count,
    total CPU, max shuffle write. Complete-mode aggregation keyed by
    run — state is one row per run, bounded by run count."""
    return stage_stream.groupBy("run").agg(
        F.count("*").alias("n_stages"),
        F.sum("executor_cpu_time_ms").alias("total_cpu_ms"),
        F.max("shuffle_bytes_written").alias("max_shuffle_write"),
    )


def summarize_to_parquet(
    stage_stream: DataFrame, store: MetricsStore, out_path: str, checkpoint_path: str
):
    """foreachBatch sink: per micro-batch, re-aggregate the FULL store
    partitions of every run present in the batch and overwrite exactly
    those runs' summary partitions (dynamic partition overwrite). The
    micro-batch only signals WHICH runs changed; the numbers come from
    the source-of-truth store. That keeps the sink both idempotent
    under Structured Streaming's at-least-once batch replay AND correct
    when a run's files straddle a micro-batch boundary — aggregating
    the batch rows directly would overwrite a run's partition with a
    partial summary whenever maxFilesPerTrigger splits the run's files
    across batches (ADVICE r02). This is the §2.9 sink shape for
    maintaining a derived table from a stream when the built-in modes
    don't fit: complete mode rewrites everything, append can't update —
    per-key partition overwrite does surgical upserts."""

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        runs = [r.run for r in batch_df.select("run").distinct().collect()]
        if not runs:
            return
        spark = batch_df.sparkSession
        # Read ONLY the affected runs' partition directories (ADVICE
        # r03): globbing run=* then filtering re-lists the whole store
        # every micro-batch — O(N²) listing work across an N-file
        # backfill with maxFilesPerTrigger=1. basePath keeps the run
        # partition column recovered from the directory names.
        full = (
            spark.read.schema(STAGE_METRICS_SCHEMA)
            .option("basePath", store.stage_path)
            .parquet(*[f"{store.stage_path}/run={r}" for r in runs])
        )
        summary = full.groupBy("run").agg(
            F.count("*").alias("n_stages"),
            F.sum("executor_cpu_time_ms").alias("total_cpu_ms"),
            F.max("shuffle_bytes_written").alias("max_shuffle_write"),
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        summary.write.mode("overwrite").partitionBy("run").parquet(out_path)

    return (
        stage_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
