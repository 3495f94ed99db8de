"""Best-practice parquet sinks (EXT — SURVEY.md §2.1 S3/S4 depth):
the write paths a 100 TB curation pipeline standardizes on.

Everything goes through ``mode("overwrite")`` — the reference's manual
exists/delete dance (CountingApp.scala:88-93) is subsumed by Spark's
sink semantics (S4), and the store's dynamic partition overwrite keeps
re-runs idempotent per partition rather than truncate-and-reload.

Scale rules encoded here:
- ``partitionBy`` low-cardinality routing columns only (lang, date):
  each distinct value is a directory; a high-cardinality partition
  column creates millions of tiny files — the #1 parquet-lake mistake.
- ``sortWithinPartitions`` on the dominant filter column gives parquet
  row-group min/max pruning (zone-map skipping) for free at read time.
- ``maxRecordsPerFile`` bounds file size so a skewed partition value
  still splits into parallel-readable files.
- bucketed tables (``bucketBy`` + ``sortBy``) pre-shuffle BOTH sides
  of a recurring fact-fact join key: the join runs with zero
  exchanges (asserted in tests/test_storage_layout.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_col: str | None = None,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Partitioned, optionally zone-map-sorted parquet write."""
    out = df.sortWithinPartitions(sort_col) if sort_col else df
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Bucketed + sorted managed table: co-locates a recurring join
    key so repeated joins on it need no exchange on either side."""
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .saveAsTable(table)
    )


def compact_parquet(
    spark, path: str, out_path: str, target_file_mb: int = 512
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ⌈bytes / target⌉ files. Streaming sinks and per-run partition
    writes accumulate small files; scan parallelism then degrades to
    file-open overhead (the classic lake maintenance job). Uses the
    actual on-disk byte size from the file index — no data pass — and
    a round-robin ``repartition`` for even file sizes. Returns the
    file count written."""
    df = spark.read.parquet(path)
    n_bytes = _dir_bytes(spark, path)
    n_files = max(1, -(-n_bytes // (target_file_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def _dir_bytes(spark, path: str) -> int:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(p).getLength()
