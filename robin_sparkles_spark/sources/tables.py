"""Fixture-table registry and scan helpers.

The driver generates a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` at /root/testdata/sf*/ (TESTDATA.md).
Everything reads through ``spark.read.parquet`` so Catalyst gets
column pruning + predicate pushdown for free — the reference's
``sc.textFile`` scan (CountingApp.scala:97) maps to ``spark.read.text``
for raw corpora and to the ``documents`` parquet for fixture queries.

At 100 TB these helpers are unchanged: parquet scans scale by adding
files/partitions; nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# All fixture tables (TESTDATA.md); one parquet file/dir per table.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. S9 in SURVEY.md §2.1.

    ``events.ts`` has shipped in two layouts across driver testdata
    generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    reader rejects outright — PARQUET_TYPE_ILLEGAL — so it's read as
    long under the legacy conf and rebuilt with exact integer ``div``,
    not ``/``: epoch-nanos exceed 2^53, so double division would
    corrupt low-order digits), and plain TIMESTAMP(MICROS) without
    UTC adjustment (read as TIMESTAMP_NTZ). Both normalize to a µs
    TimestampType instant; under the pinned UTC session zone the
    values are identical either way, and DuckDB's own handling of the
    same file (ns-truncation / naive µs) matches, keeping oracle
    parity.
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    # Pin UTC defensively: the driver harness supplies its own session,
    # and any epoch-instant column (events.ts) formats through the
    # session zone — a non-UTC session would shift every window/date
    # string 5h against the UTC-naive DuckDB oracle (measured).
    # Runtime-settable, so safe to assert here.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F, types as T

        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):  # legacy nanos layout
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # TIMESTAMP_NTZ (µs, no UTC adjustment): reinterpret the naive
        # wall clock as a UTC instant — exact under the pinned zone.
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def text_corpus_df(spark: SparkSession, lines: list[str]) -> DataFrame:
    """In-memory text corpus (S2) — the reference test's
    ``sc.parallelize(Seq(...))`` (WordCountTest.scala:15-17), as a
    single-column DataFrame ``value: string`` matching what
    ``spark.read.text`` (S1) would produce.
    """
    return spark.createDataFrame([(line,) for line in lines], schema="value string")


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S1: newline-delimited text scan → ``value: string``."""
    return spark.read.text(path)


# r15 (guide §2.5 input skew): the fixture tables are ONE parquet file
# with ONE row group each, so any scan of them is a single
# unsplittable task — heavy map work fused into that stage (e.g. the
# 63-sum wide-simhash aggregate's partial sums) runs on one core of
# the whole budget. ``fan_out_width`` says how wide to round-robin
# such a scan AFTER the read: the session core budget for tiny inputs,
# 0 (do not repartition) once the input is big enough to split
# naturally — so at production scale the repartition (and its shuffle)
# vanishes from the plan. Threshold env-tunable for deployments whose
# row-group layout differs.
FAN_OUT_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_FAN_OUT_MAX_BYTES", str(256 * 1024 * 1024))
)


def fan_out_width(sf_dir: str, name: str) -> int:
    return fan_out_width_path(os.path.join(sf_dir, f"{name}.parquet"))


def fan_out_width_path(path: str) -> int:
    """Path-based form of :func:`fan_out_width` for staged corpora
    that live outside the sf_dir layout (e.g. the re-chunked Gopher
    repetition corpus)."""
    from ..session import default_parallelism

    try:
        if os.path.isdir(path):
            size = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        else:
            size = os.path.getsize(path)
    except OSError:
        return 0
    return default_parallelism() if size < FAN_OUT_MAX_BYTES else 0
