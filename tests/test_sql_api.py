"""The SQL-string API surface: same tables, same results as the
DataFrame API (Catalyst compiles both to the same plans)."""

from __future__ import annotations

from robin_sparkles_spark.operators.relational import q1_pricing_summary
from robin_sparkles_spark.sql import run_sql


def test_sql_matches_dataframe_api(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir).toPandas()
    sql = run_sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """,
    ).toPandas()
    key = ["l_returnflag", "l_linestatus"]
    merged = df.merge(sql, on=key, suffixes=("_df", "_sql"))
    assert len(merged) == len(df) == len(sql) > 0
    assert (merged["sum_qty_df"] == merged["sum_qty_sql"]).all()
    assert (merged["count_order_df"] == merged["count_order_sql"]).all()


def test_sql_view_registration_is_idempotent(spark, sf_dir):
    a = run_sql(spark, sf_dir, "SELECT COUNT(*) AS n FROM documents").collect()[0].n
    b = run_sql(spark, sf_dir, "SELECT COUNT(*) AS n FROM documents").collect()[0].n
    assert a == b > 0
