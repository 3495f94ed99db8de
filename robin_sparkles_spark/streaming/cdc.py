"""Streaming CDC apply — the SINK side of the changelog story.

``operators/scale_ops.orders_upsert_latest`` is the batch latest-wins
merge; this module applies the same semantics CONTINUOUSLY: a change
stream (key, version, value, deleted) lands in micro-batches, and
``foreachBatch`` merges each batch into a keyed state table.

Exactly-once argument (the part worth stating precisely): Structured
Streaming guarantees ``foreachBatch`` sees each batch id at least
once — a crash between sink commit and checkpoint commit replays the
batch. The merge is therefore built IDEMPOTENT: latest-wins keyed on
(version, then value for exact ties) is a join-semilattice fold, so
re-merging an already-applied batch is a no-op, and state ==
f(set of changes seen) regardless of replays. That, plus the source's
offset log, upgrades at-least-once delivery to exactly-once state.

Scale posture: the test-scale apply rewrites the whole state per
batch (read + union + max_by + overwrite — fine for MBs of state). At
100 TB the identical ``apply_changes`` logic lands behind a partition
filter: changes are bucketed by key range, only touched partitions
are rewritten (dynamic partition overwrite), or the same expression
becomes a lakehouse MERGE INTO. The latest-wins aggregate is ONE hash
agg — no window, no sort — exactly like the batch twin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

CHANGES_SCHEMA = "key long, version long, value double, deleted boolean"


def latest_wins(changes: DataFrame) -> DataFrame:
    """One hash aggregation: per key, the row of the max (version,
    value) pair — deterministic under version ties, no sort."""
    packed = F.struct(
        F.col("version"), F.col("value"), F.col("deleted")
    )
    return (
        changes.groupBy("key")
        .agg(F.max(packed).alias("w"))
        .select(
            "key",
            F.col("w.version").alias("version"),
            F.col("w.value").alias("value"),
            F.col("w.deleted").alias("deleted"),
        )
    )


def read_state(spark: SparkSession, state_path: str) -> DataFrame:
    if os.path.exists(os.path.join(state_path, "_SUCCESS")):
        return spark.read.parquet(state_path)
    return spark.createDataFrame([], CHANGES_SCHEMA)


def apply_changes(spark: SparkSession, state_path: str, batch: DataFrame) -> None:
    """Merge one micro-batch into the state table: union with current
    state, latest-wins, drop tombstones, overwrite. Idempotent —
    replaying a batch reaches the same fixpoint."""
    merged = latest_wins(read_state(spark, state_path).unionByName(batch))
    live = merged.where(~F.col("deleted"))
    # collect-then-overwrite avoids reading and writing the same files
    # concurrently at test scale; the 100 TB shape is a partition-
    # filtered dynamic overwrite or MERGE INTO (see module docstring)
    rows = live.collect()
    spark.createDataFrame(rows, CHANGES_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(state_path)


def stream_upsert(
    spark: SparkSession, src_dir: str, state_path: str, checkpoint: str,
    available_now: bool = True,
):
    """Checkpointed change-stream apply: file source over ``src_dir``
    → foreachBatch latest-wins merge into ``state_path``."""
    stream = (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/*")
    )

    def sink(batch: DataFrame, _batch_id: int) -> None:
        apply_changes(spark, state_path, batch)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="0 seconds")
    return writer.start()
