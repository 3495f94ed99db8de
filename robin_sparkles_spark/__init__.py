"""robin_sparkles_spark — a PySpark-native analytics engine.

A ground-up, DataFrame-first rebuild of the capabilities of the
``high-performance-spark/robin-sparkles`` reference (a Spark auto-tuner
with a word-count demo workload; see SURVEY.md), extended with the
LLM-data-pipeline operator surface (dedup, similarity search, text
analysis, multimodal columns) required by BASELINE.json, all designed
for 100 TB scale: declarative plans for Catalyst, broadcast-able dims,
partial aggregation, zero row-at-a-time Python UDFs on hot paths.

Layout
------
- ``session``     SparkSession builder (AQE on, UTC, Arrow).
- ``sources``     table registry + parquet scans over the fixture dirs.
- ``functions``   reusable Column expression builders (text, hashing,
                  vectors) — pure, JVM-evaluated, codegen-friendly.
- ``operators``   the query/operator surface (SURVEY.md §2 inventory +
                  EXT rows): wordcount, relational, dedup, similarity,
                  text analysis, multimodal.
- ``metrics``     per-run stage/task metrics store (parquet,
                  partitioned by run) — the reference's flight-recorder
                  pipeline rebuilt on DataFrames.
- ``tuner``       partition-count heuristics H1–H8 with bit-for-bit
                  reference semantics, plus the DataFrame summarizer.
- ``streaming``   Structured Streaming over the events table.
- ``plans``       explain()-based plan audits (pushdown, broadcast,
                  codegen) used by tests and bench.
"""

__version__ = "0.1.0"
