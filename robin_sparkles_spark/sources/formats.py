"""Ingest/egress formats beyond parquet (EXT — SURVEY.md §2.1 sink
design): JSONL and CSV readers/writers for the documents corpus.

Real-world training pipelines ingest JSONL (one document object per
line) far more often than parquet; CSV shows up for tabular sidecar
metadata. Scale rules baked in:

- ALWAYS pass an explicit schema to readers. Schema inference is a
  full extra pass over the data (2× read at 100 TB) and can silently
  widen/narrow types between ingests; an explicit schema is also what
  makes corrupt-record handling well-defined.
- ``columnNameOfCorruptRecord`` captures undecodable lines instead of
  failing the job — at 100 TB there WILL be malformed lines, and a
  10-hour ingest must not die at hour 9 (PERMISSIVE + audit count,
  not FAILFAST).
- Writers go through ``mode("overwrite")`` like every sink here (S4
  semantics — no manual FS calls, reference CountingApp.scala:88-93).
- JSONL/CSV are line-splittable: Spark parallelizes a single huge
  file by byte ranges, so ingest parallelism is free. (Gzip is NOT
  splittable — production corpora should arrive as many .gz shards or
  zstd-in-parquet, documented here because it is the #1 real-world
  ingest bottleneck.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# The documents corpus schema (TESTDATA.md) + a corrupt-record capture
# column for PERMISSIVE parsing.
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_CORRUPT_COL = "_corrupt_record"


def _schema_with_corrupt(schema: StructType) -> StructType:
    return StructType(list(schema.fields) + [StructField(_CORRUPT_COL, StringType())])


def write_jsonl(df: DataFrame, path: str) -> None:
    """One JSON object per line, overwrite semantics (S4)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Schema-explicit JSONL scan; malformed lines land in
    ``_corrupt_record`` (dropped from the result, counted by
    ``corrupt_count`` below) instead of killing the job."""
    raw = (
        spark.read.schema(_schema_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        .json(path)
    )
    return raw.where(F.col(_CORRUPT_COL).isNull()).drop(_CORRUPT_COL)


def corrupt_count(
    spark: SparkSession, path: str, schema: StructType = DOCUMENTS_SCHEMA
) -> int:
    """Audit: number of undecodable lines in a JSONL corpus. Spark
    requires referencing the corrupt column through a cache/materialize
    boundary, hence the dedicated scan."""
    raw = (
        spark.read.schema(_schema_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        .json(path)
    )
    return raw.cache().where(F.col(_CORRUPT_COL).isNotNull()).count()


def write_csv(df: DataFrame, path: str) -> None:
    """Header + full quoting (documents text contains commas/newlines;
    escape-by-quote keeps the file line-splittable for every RFC-4180
    reader), overwrite semantics (S4)."""
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Schema-explicit CSV scan with RFC-4180 quote handling;
    multiLine tolerates quoted embedded newlines (at the cost of
    per-file instead of per-range splitting — documented trade)."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC writer (zlib default; columnar like parquet) — the other
    big columnar lake format, common in Hive-heritage estates. Same
    pushdown/pruning story as parquet via Spark's vectorized ORC
    reader; overwrite semantics (S4)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. Schema comes from ORC's own footer metadata (self-
    describing like parquet — no inference pass, unlike JSONL/CSV)."""
    return spark.read.orc(path)
