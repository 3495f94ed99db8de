"""Arrow-vectorized similarity kernels — the production fast path.

The declared ``ann_*`` queries use interpreted Catalyst folds because
the oracle gate needs bit-exact cross-engine doubles. In production
the per-pair dot product belongs in a *vectorized* kernel: one
``mapInPandas`` stage turns each Arrow batch of candidate pairs into a
single numpy matmul (BLAS), ~50× the fold's throughput at 64 dims —
the one place in this engine where the Pandas-UDF escape hatch earns
its serialization cost (SURVEY.md §2.10 policy: Arrow-batched, never
row-at-a-time).

Numeric note: BLAS accumulates in a different order than a sequential
fold, so results differ from the declared queries in the last few
ulps — tests pin agreement to 1e-9 and identical top-k sets. That is
why this module is library-surface only (not oracle-declared).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.vectors import as_double, normalized
from ..sources import load_table

TOP_K = 5
N_QUERIES = 100


def _unit_vectors_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No groupBy barrier here, unlike similarity._unit_vectors: that
    # barrier exists to stop Catalyst re-evaluating the normalization
    # per PAIR inside the brute-force join. The Arrow path consumes
    # each corpus row exactly once in mapInPandas, so the projection
    # stays fused with the parquet scan — zero shuffles before the
    # kernel, and the filter on vec_id (query collect) pushes down.
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", normalized(as_double(F.col("embedding"))).alias("v")
    )


def ann_bruteforce_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS brute-force top-k: broadcast the query matrix to every
    partition, one matmul per Arrow batch of corpus vectors, local
    top-k per batch, global top-k via the rank window over the (small)
    per-batch survivors.

    Scale shape: corpus streams partition-parallel; per batch of B
    corpus rows only B·K candidate rows survive to the shuffle, so the
    window input is K·N/B·Q rows, not Q·N."""
    vecs = _unit_vectors_np(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < N_QUERIES).collect()
    q_ids = np.array([r.vec_id for r in queries], dtype=np.int64)
    q_mat = np.array([r.v for r in queries], dtype=np.float64)  # Q × D
    sc = spark.sparkContext
    b_ids = sc.broadcast(q_ids)
    b_mat = sc.broadcast(q_mat)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = b_ids.value, b_mat.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf["v"].to_numpy())  # B × D
            sims = mat @ c_mat.T  # Q × B — one BLAS call per batch
            # local top-k per query within this batch
            k = min(TOP_K + 1, sims.shape[1])  # +1 to survive self-match removal
            idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
            rows_q = np.repeat(ids, k)
            rows_n = c_ids[idx].ravel()
            rows_s = np.take_along_axis(sims, idx, axis=1).ravel()
            keep = rows_q != rows_n
            yield pd.DataFrame(
                {
                    "query_id": rows_q[keep],
                    "neighbor_id": rows_n[keep],
                    "cos_sim": rows_s[keep],
                }
            )

    survivors = vecs.mapInPandas(
        score, schema="query_id long, neighbor_id long, cos_sim double"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )
