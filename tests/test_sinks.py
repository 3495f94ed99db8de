"""Best-practice sink helpers: partitioned writes prune at read time,
bucketed tables join exchange-free (deeper assertions live in
test_storage_layout.py — these cover the packaged helpers)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from robin_sparkles_spark.plans import audit_plan
from robin_sparkles_spark.sources import load_table
from robin_sparkles_spark.sources.sinks import write_bucketed_table, write_partitioned


def test_write_partitioned_prunes_and_sorts(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"], sort_col="doc_id")
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    pruned = back.where(F.col("lang") == "en")
    a = audit_plan(pruned)
    assert "PartitionFilters: [" in a.formatted and "lang" in a.formatted, a.formatted


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from robin_sparkles_spark.sources.sinks import compact_parquet

    docs = load_table(spark, sf_dir, "documents")
    frag = str(tmp_path / "fragmented")
    docs.repartition(16).write.parquet(frag)  # 16 tiny files
    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, out, target_file_mb=512)
    assert n == 1  # tiny corpus fits one target file
    import glob

    assert len(glob.glob(f"{out}/*.parquet")) == 1
    back = spark.read.parquet(out)
    assert back.count() == docs.count()


def test_write_bucketed_table_joins_without_exchange(spark, sf_dir):
    t1, t2 = (f"b_{uuid.uuid4().hex[:8]}" for _ in range(2))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    try:
        write_bucketed_table(o, t1, "o_orderkey")
        write_bucketed_table(l, t2, "l_orderkey")
        threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table(t1).join(
                spark.table(t2), F.col("o_orderkey") == F.col("l_orderkey")
            )
            a = audit_plan(j)
            assert a.exchanges == 0, a.formatted
            assert j.count() == l.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_schema_evolution_reads_merged_columns(spark, sf_dir, tmp_path):
    """Lake reality: a later ingest adds a column. mergeSchema reads
    the union schema with NULLs for the old files — and without the
    option Spark serves only the first-footer schema, so the option is
    load-bearing, not decorative."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.sources import load_table

    out = str(tmp_path / "evolving")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.where("doc_id % 2 = 0").write.mode("overwrite").parquet(out)
    (
        docs.where("doc_id % 2 = 1")
        .withColumn("quality", F.length("text").cast("double"))
        .write.mode("append")
        .parquet(out)
    )
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"doc_id", "text", "quality"}
    n_total = docs.count()
    assert merged.count() == n_total
    with_q = merged.where(F.col("quality").isNotNull()).count()
    assert 0 < with_q < n_total  # old files NULL, new files populated
