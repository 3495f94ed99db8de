"""Cross-modal retrieval (r14) — recall gate + plan audit.

The `pq_recall_at_k` pattern: retrieval quality is itself a declared,
hash-gated query; these tests pin the QUALITY floor and the PLAN shape
so a regression in the fit, probe logic, or staging fails CI before
the driver gate sees it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from robin_sparkles_spark.operators import crossmodal as CM
from robin_sparkles_spark.plans.audit import audit_plan


def test_paired_recall_gate(spark, sf_dir):
    """Every planted text query must retrieve its paired image in its
    IVF top-k at the shipped nprobe — measured 1.0 at sf0.001/sf0.01;
    gate at 0.95 to absorb future fixture regeneration."""
    row = CM.crossmodal_paired_recall(spark, sf_dir).collect()[0]
    assert row.n_queries == CM.CM_N_QUERIES
    assert row.paired_recall >= 0.95, row.asDict()


def test_paired_image_ranks_first_for_most_queries(spark, sf_dir):
    """±5 % perturbation keeps the paired image cosine-closest for
    nearly all queries — the alignment property the fixture plants."""
    topk = CM.crossmodal_text_image_topk(spark, sf_dir)
    rank1_paired = (
        topk.where((F.col("rank") == 1) & (F.col("image_id") == F.col("query_id")))
        .count()
    )
    assert rank1_paired >= 0.9 * CM.CM_N_QUERIES, rank1_paired


def test_staging_idempotent_and_bounded(spark, sf_dir):
    p1 = CM.build_crossmodal_queries(spark, sf_dir)
    p2 = CM.build_crossmodal_queries(spark, sf_dir)
    assert p1 == p2
    n = spark.read.parquet(p1).count()
    assert n == CM.CM_N_QUERIES


def test_topk_plan_shape(spark, sf_dir):
    """Cell equi-join with the BOUNDED query side broadcast (never the
    corpus side), no nested loop, no Python eval — the IVF family's
    posture."""
    a = audit_plan(CM.crossmodal_text_image_topk(spark, sf_dir))
    assert a.bnl_joins == 0, a.formatted
    assert not a.has_python_eval, a.formatted
    assert a.broadcast_joins >= 1, a.formatted  # the bounded query side
    # the join key is the learned cell — an equi-join, not a theta scan
    assert "probe" in a.formatted and "cluster" in a.formatted
