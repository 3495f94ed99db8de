"""Structured Streaming over the events table.

Batch/stream parity design: every streaming aggregation here has a
batch twin in ``operators.streaming_queries`` (same expressions over
the same table read as a batch DataFrame) — the batch twin is what the
DuckDB oracle checks, and tests assert stream==batch on the fixture
data, so the streaming path is transitively oracle-checked.

Scale notes: file-source streams partition per file at 100 TB
(maxFilesPerTrigger bounds micro-batch size); all aggregations are
keyed by (window, …) so state is bounded by watermark horizon ×
keyspace; ``dropDuplicatesWithinWatermark`` keeps dedup state bounded
by the watermark too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

def events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over the events parquet (readStream →
    the same rows the batch scan sees, delivered in micro-batches).

    The stream reader needs its schema up front; ``events.ts`` has
    shipped as both TIMESTAMP(NANOS) (→ long under nanosAsLong) and
    TIMESTAMP(MICROS)/NTZ across testdata generations, so the schema
    is taken from a batch footer read of the same file and ``ts`` is
    normalized exactly as in ``sources.tables.load_table``."""
    import hashlib
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # see sources.tables
    # The file stream source needs a DIRECTORY to watch; the fixture is
    # a single read-only file → stage a symlink dir (no data copied).
    # In production this is simply the landing directory new files
    # arrive into.
    src = os.path.realpath(os.path.join(sf_dir, "events.parquet"))
    tag = hashlib.sha1(src.encode()).hexdigest()[:12]
    watch_dir = os.path.join(tempfile.gettempdir(), f"rss_stream_{tag}")
    os.makedirs(watch_dir, exist_ok=True)
    link = os.path.join(watch_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    raw_schema = spark.read.parquet(src).schema  # footer-only read
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(watch_dir)
    )
    if isinstance(raw_schema["ts"].dataType, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + exact-decimal
    value sum. Append-mode-compatible (watermarked window keys)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Sliding windows (30 min length, 15 min slide) per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "30 minutes", "15 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Per-user session windows (gap-based) — the built-in stateful
    session operator; the batch twin computes identical sessions with
    gaps-and-islands (operators.streaming_queries.user_sessions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


def deduped_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Late-data dedup: dropDuplicatesWithinWatermark on event_id —
    state bounded by the watermark horizon (the 100 TB-safe dedup for
    at-least-once sources)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def cohort_enriched_stream(events: DataFrame, nations: DataFrame) -> DataFrame:
    """Stream-STATIC enrichment join + aggregation: each event maps to
    a cohort key (user_id % 25) joined against the static nation dim.
    The static side is re-broadcast per micro-batch (no join state, no
    watermark required — only the aggregation holds state), which is
    the canonical enrich-then-aggregate shape for dimension data that
    fits in memory; at 100 TB the dim stays broadcast-sized while the
    stream side scales with partitions.

    Works identically on batch inputs —
    ``operators.streaming_queries.events_cohort_enriched`` is the
    declared, DuckDB-checked twin; tests/test_streaming.py asserts
    stream == batch."""
    cohort = (F.col("user_id") % F.lit(25)).cast("int")
    dim = nations.select(F.col("n_nationkey").cast("int").alias("cohort"), "n_name")
    return (
        events.withColumn("cohort", cohort)
        .join(F.broadcast(dim), "cohort")
        .groupBy(F.col("n_name").alias("cohort_name"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def attribution_join_stream(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase attributed to every
    view by the same user within the preceding 30 minutes — the
    click-attribution shape. Both sides watermarked, and the join
    condition bounds purchase_ts to [view_ts, view_ts + 30 min], so
    Spark can expire view state once the purchase watermark passes
    view_ts + 30 min and purchase state once the view watermark passes
    purchase_ts: state is bounded by watermark horizon × arrival rate,
    the requirement for an unbounded 100 TB stream.

    Works identically on batch inputs (withWatermark is a no-op in
    batch) — ``operators.streaming_queries.view_purchase_attribution``
    is the declared, DuckDB-checked twin."""
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", "1 hour")
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    ).withWatermark("purchase_ts", "1 hour")
    joined = v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_time"),
        "value",
    )


def attribution_join_stream_outer(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every view, with its
    attributed purchase or sentinel values when none arrives within
    30 minutes — the "which impressions did NOT convert" shape. Same
    watermark/time-bound state contract as the inner join, plus the
    outer-specific semantics: a view's NULL-side row is emitted only
    once the PURCHASE watermark passes view_ts + 30 min (Spark must
    prove no match can still arrive), so unmatched results trail live
    data by the watermark delay — the inherent outer-join latency, not
    a defect. Sentinels (-1 / '' / 0.0) replace NULLs because the
    declared twin is oracle-hashed and NULL floats round-trip
    differently across engines (see curation.dedup_incremental)."""
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", "1 hour")
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    ).withWatermark("purchase_ts", "1 hour")
    joined = v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    return joined.select(
        "user_id",
        "view_id",
        F.coalesce(F.col("purchase_id"), F.lit(-1)).alias("purchase_id"),
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_time"),
        F.coalesce(
            F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss"), F.lit("")
        ).alias("purchase_time"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming query to completion over the (finite) fixture
    files via the memory sink; returns the bounded result table name.
    Test/smoke harness — production sinks are parquet/Kafka via
    writeStream as usual."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name
