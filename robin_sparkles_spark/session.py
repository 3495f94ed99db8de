"""SparkSession factory for the engine.

Defaults chosen for oracle parity and scale behavior:

- AQE on (runtime partition coalescing, skew-join splitting) — this is
  the *within-query* half of what the reference's cross-run tuner does
  (SURVEY.md §4); the tuner supplies the cross-run half.
- UTC session timezone — DuckDB timestamps are UTC-naive; without this
  every timestamp comparison in the oracle gate would be off by the
  local zone.
- Arrow enabled — vectorized pandas_udf / toPandas transfers.
- Shuffle partitions default to the local core budget, not Spark's 200:
  on local[N] anything above N just adds scheduling overhead, and at
  cluster scale the tuner (robin_sparkles_spark.tuner) recommends the
  real value from recorded run history.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Core budget for local runs: $SPARK_GRAFT_CPUS, else 32."""
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "robin_sparkles_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the engine's SparkSession.

    ``shuffle_partitions`` may be overridden by the tuner's
    recommendation (see ``tuner.recommend``); like the reference's
    ``spark.default.parallelism`` write (CountingApp.scala:77) this is
    plain conf injection, not a planner hook — Spark SQL makes it
    session-mutable, so re-tuning between queries needs no restart.
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.default.parallelism", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r15 (guide §2.2/§2.4): AQE's coalescing floor. The default
        # floor (1 MB) collapses every sub-32 MB shuffle to a handful
        # of partitions, which SERIALIZES the compute that runs after
        # the exchange — measured on the shared unit-vector index
        # (≈1 MB at sf0.1): 1 post-shuffle partition, so every ANN
        # fold/argmin consumer ran on one core of 32. A 48 KB floor
        # re-opens up-to-core-budget parallelism for small
        # intermediates (pq_rerank_topk 3.0→2.1 s, crossmodal topk
        # 1.8→1.0 s, semdedup 2.3→1.0 s, min-of-3) while leaving big
        # shuffles untouched: with parallelismFirst (default true) the
        # coalesce target is max(bytes/parallelism, floor), so any
        # shuffle above cores·48 KB ≈ 1.5 MB picks bytes/parallelism
        # exactly as before, and at 100 TB post-shuffle partitions are
        # hundreds of MB — the floor is a no-op there. Env-tunable for
        # deployments whose task-launch overhead differs.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "48k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime row-level pruning: build a bloom filter from the
        # small side of a shuffle join and push it into the big side's
        # scan — a large-join win that costs nothing when inapplicable
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def active_or_local(app_name: str) -> SparkSession:
    """The session-acquisition rule every lazy oracle shares: reuse
    the live session when one exists (any session works — the staged
    corpora and fits are bit-deterministic), else start a small
    local[8] one (oracle generation is light; no need for the full
    core budget)."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        spark = get_spark(app_name=app_name, master="local[8]")
    return spark
