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
        # r16 (guide §2.2, VERDICT r15 #1/#2): back to Spark's default
        # 1 MB coalescing floor. The r15 48 KB floor was justified by
        # three ANN-family wins (tiny post-shuffle intermediates were
        # collapsing to 1 partition and serializing heavy per-row
        # vector compute), but it is SESSION-WIDE: it multiplies the
        # post-shuffle task count of every small shuffle, and the
        # driver's cold protocol read the whole headline set as
        # task-overhead-bound (8 cores beat 32 on all 19 queries).
        # Cold-protocol A/B this round (fresh process, count(), 5
        # interleaved reps): with the r15 reuse barriers removed, 1 MB
        # beats 48 KB on the dedup/text family (ngram 2.71→2.12 s,
        # containment 2.23→1.55, top_terms 1.27→1.09 med) while the
        # ANN-family serialization is fixed LOCALLY instead — the
        # shared vector indexes carry an explicit-width repartition
        # (exempt from AQE coalescing) behind their one-time build
        # (similarity.unit_vector_index, semdedup._assigned_index,
        # clustering._ivf_topk, crossmodal — all gated by
        # tables.fan_out_width, so the extra exchange vanishes at
        # production scale), which restores pq/ivfpq/crossmodal/
        # semdedup to their 48 KB-floor walls without taxing every
        # other shuffle. Env knob kept for deployments whose
        # task-launch overhead differs.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "1m"),
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
