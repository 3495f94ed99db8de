"""Custom Python DataSource (Spark 4 API): oracle parity, partition
planning, and filter pushdown observability."""

from __future__ import annotations

from pyspark.sql import functions as F

from robin_sparkles_spark.operators import pysource
from robin_sparkles_spark.sources.pydatasource import (
    DEFAULT_PARTS,
    DEFAULT_ROWS,
    N_TYPES,
    SOURCE_NAME,
    register,
)

from .oracle_utils import assert_query_matches_oracle


def test_pysource_oracle_parity(spark, sf_dir):
    fn, oracle = pysource.QUERIES_TAIL["pysource_events_agg"]
    assert_query_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)


def test_pysource_partition_planning(spark):
    """The source's partitions() contract must reach the scheduler:
    the scan parallelizes over the declared InputPartition count."""
    register(spark)
    df = spark.read.format(SOURCE_NAME).load()
    assert df.rdd.getNumPartitions() == DEFAULT_PARTS
    assert df.count() == DEFAULT_ROWS


def test_pysource_filter_pushdown_absorbs_equality(spark):
    """pushFilters must CONSUME the event_type equality: the result is
    correct AND the post-scan Filter no longer carries the equality
    predicate (only the isnotnull Spark keeps for null semantics) —
    i.e. the rows were dropped inside the generator, not above it."""
    register(spark)
    df = (
        spark.read.format(SOURCE_NAME)
        .load()
        .where(F.col("event_type") == "type_2")
    )
    assert df.count() == DEFAULT_ROWS // N_TYPES
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "type_2" not in plan, plan
    ids = [r.event_id for r in df.select("event_id").collect()]
    assert all(i % N_TYPES == 2 for i in ids)


def test_pysource_arrow_path_identical_rows(spark):
    """The Arrow-batch reader must produce the identical dataset as
    the row reader (same ids, types, values), with pushdown intact."""
    register(spark)
    row_df = spark.read.format(SOURCE_NAME).load()
    arrow_df = spark.read.format(SOURCE_NAME).option("arrow", "true").load()
    assert sorted(map(tuple, row_df.collect())) == sorted(
        map(tuple, arrow_df.collect())
    )
    filtered = (
        spark.read.format(SOURCE_NAME)
        .option("arrow", "true")
        .load()
        .where(F.col("event_type") == "type_3")
    )
    assert filtered.count() == DEFAULT_ROWS // N_TYPES
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "type_3" not in plan, plan


def test_pysource_stream_equals_batch(spark, tmp_path):
    """Streaming twin discipline: draining the source's offset-tracked
    micro-batch stream (5 batches of 4096 at the default cap) must
    yield the batch reader's dataset exactly — same count, no
    duplicate event_ids (exactly-once across offsets), same value
    sum."""
    import time

    register(spark)
    q = (
        spark.readStream.format(SOURCE_NAME)
        .load()
        .writeStream.format("memory")
        .queryName("pysource_stream_tw")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            c = spark.sql(
                "select count(*) c from pysource_stream_tw"
            ).collect()[0].c
            if c >= DEFAULT_ROWS:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    row = spark.sql(
        "select count(*) c, count(distinct event_id) d, sum(value) s "
        "from pysource_stream_tw"
    ).collect()[0]
    batch = (
        spark.read.format(SOURCE_NAME)
        .load()
        .selectExpr("count(*) c", "sum(value) s")
        .collect()[0]
    )
    assert row.c == batch.c == DEFAULT_ROWS
    assert row.d == row.c  # no replays doubled into the sink
    assert row.s == batch.s
