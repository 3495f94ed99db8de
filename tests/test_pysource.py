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
