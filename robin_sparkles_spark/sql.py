"""SQL-string entry point: the engine's second API surface.

Every declared operator is a DataFrame plan, but the same tables are
queryable as ANSI SQL through temp views — ``run_sql`` registers the
fixture views (idempotent) and executes one statement. Catalyst
compiles both surfaces to the same plans, so this is a convenience
layer, not a second engine; tests assert DataFrame/SQL plan-result
equality on a representative query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources import register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Execute one SQL statement against the fixture tables (views
    ``region nation customer supplier part orders lineitem events
    documents embeddings``)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
