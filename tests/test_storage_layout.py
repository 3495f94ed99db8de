"""Storage-layout scale patterns: bucketed co-located joins and
partitioned writes with partition pruning — the at-rest half of the
100 TB posture (SURVEY.md §2.1 sink design)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from robin_sparkles_spark.plans import audit_plan
from robin_sparkles_spark.sources import load_table


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """bucketBy on the join key co-locates both sides: the sort-merge
    join runs with ZERO exchanges (at 100 TB this removes the two
    dominant shuffles of every fact-fact join on that key)."""
    suffix = uuid.uuid4().hex[:8]
    lt, ot = f"li_b_{suffix}", f"or_b_{suffix}"
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    try:
        (
            lineitem.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(lt)
        )
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(ot)
        )
        # disable broadcast so the plan exercises the bucketed
        # sort-merge path — the shape that matters when BOTH sides are
        # fact-sized (a broadcastable side needs no bucketing at all)
        threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table(lt).join(
                spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey")
            )
            a = audit_plan(joined)
            assert a.sortmerge_joins == 1, a.formatted
            assert a.exchanges == 0, a.formatted
            assert joined.count() == lineitem.count()  # FK: every item has an order
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """partitionBy(lang) at write time → a lang predicate at read time
    becomes directory pruning (PartitionFilters), not data filtering."""
    out = str(tmp_path / "docs_by_lang")
    load_table(spark, sf_dir, "documents").write.partitionBy("lang").mode(
        "overwrite"
    ).parquet(out)
    back = spark.read.parquet(out).where(F.col("lang") == "en")
    a = audit_plan(back)
    assert "PartitionFilters: [" in a.formatted
    assert "lang" in a.formatted.split("PartitionFilters:", 1)[1].splitlines()[0]
    n_en = back.count()
    n_all = spark.read.parquet(out).count()
    assert 0 < n_en < n_all
