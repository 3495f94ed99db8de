"""BLAS fast-path vs declared fold-path: identical top-k sets, values
within float slack (different accumulation order), and a real speed
check at sf0.1."""

from __future__ import annotations

import time

from robin_sparkles_spark.operators.similarity import ann_bruteforce_topk
from robin_sparkles_spark.operators.similarity_fast import ann_bruteforce_topk_fast


def test_fast_matches_fold_topk(spark, sf_dir):
    slow = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in ann_bruteforce_topk(spark, sf_dir).collect()
    }
    fast = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in ann_bruteforce_topk_fast(spark, sf_dir).collect()
    }
    assert slow.keys() == fast.keys()
    for key, (n_slow, s_slow) in slow.items():
        n_fast, s_fast = fast[key]
        assert n_slow == n_fast, f"{key}: neighbor {n_slow} != {n_fast}"
        assert abs(s_slow - s_fast) < 1e-9


def test_fast_is_faster_at_sf01(spark):
    sf = "/root/testdata/sf0.1"
    t0 = time.perf_counter()
    ann_bruteforce_topk(spark, sf).count()
    t_fold = time.perf_counter() - t0
    t0 = time.perf_counter()
    ann_bruteforce_topk_fast(spark, sf).count()
    t_fast = time.perf_counter() - t0
    # Arrow+BLAS must beat the interpreted fold (typically ≫2×; assert
    # conservatively to keep the test robust on a loaded machine)
    assert t_fast < t_fold, f"fast={t_fast:.2f}s fold={t_fold:.2f}s"
