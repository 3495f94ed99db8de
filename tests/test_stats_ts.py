"""Third-opinion checks for the statistics/time-series operators: the
DuckDB oracle shares each query's formula, so these tests recompute
the results with INDEPENDENT implementations (pure Python fold,
numpy moments) to pin semantics, not just cross-engine agreement.
"""

from __future__ import annotations

import numpy as np

from robin_sparkles_spark.operators import stats, timeseries
from robin_sparkles_spark.sources import load_table

SF_SMALL = "/root/testdata/sf0.001"


def _py_ewma(values: list[float]) -> float:
    """The bounded-history fold in plain Python: seed with the oldest
    frame value, then acc = acc*0.5 + x*0.5 — exactly the engine ops."""
    acc = values[0]
    for x in values[1:]:
        acc = acc * 0.5 + x * 0.5
    return acc


def test_ewma_matches_python_fold_exactly(spark):
    """Every output row must equal the pure-Python fold over that
    row's trailing frame bit-for-bit (alpha=0.5 is exact in binary,
    so there is no tolerance to hide behind)."""
    from pyspark.sql import functions as F

    out = {
        r.event_id: r.ewma
        for r in timeseries.events_ewma_value(spark, SF_SMALL).collect()
    }
    assert out, "no purchase events in the smoke fixture"
    ev = (
        load_table(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"), "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    n_checked = 0
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.us, r.event_id))
        vals = [r.value for r in rows]
        for i, r in enumerate(rows):
            frame = vals[max(0, i - (timeseries.EWMA_HISTORY - 1)) : i + 1]
            assert out[r.event_id] == _py_ewma(frame), r.event_id
            n_checked += 1
    assert n_checked == len(out)


def test_ewma_between_min_and_max_of_frame(spark):
    """Convexity: an EWMA of a frame lies within [min, max] of it."""
    from pyspark.sql import functions as F

    bad = (
        timeseries.events_ewma_value(spark, SF_SMALL)
        .groupBy("user_id")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.min("ewma").alias("elo"),
            F.max("ewma").alias("ehi"),
        )
        .where((F.col("elo") < F.col("lo")) | (F.col("ehi") > F.col("hi")))
        .count()
    )
    assert bad == 0


def test_ols_matches_numpy_moments(spark):
    """corr/slope/intercept within the floor-quantization error bound
    of numpy's float64 computation: each centered product is floored
    (≤ 1 downward per term), so |ΔΣ| ≤ n and the per-statistic bounds
    follow by propagation — Δcorr ≤ n/√(ΣxxΣyy), Δslope ≤ n/Σxx·(1 +
    |slope|·Σxx/√(ΣxxΣyy)) ≈ n/Σxx near-zero corr. Bounds computed
    from the numpy moments; 2× slack for the reference's own float
    error."""
    rows = stats.lineitem_qty_price_ols(spark, SF_SMALL).collect()
    l = (
        load_table(spark, SF_SMALL, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in l:
        by_flag.setdefault(r.l_returnflag, []).append(
            (r.l_quantity, r.l_extendedprice)
        )
    assert rows
    for r in rows:
        x = np.array([p[0] for p in by_flag[r.l_returnflag]])
        y = np.array([p[1] for p in by_flag[r.l_returnflag]])
        n = len(x)
        sxx = float(np.sum((x - x.mean()) ** 2))
        syy = float(np.sum((y - y.mean()) ** 2))
        ref_corr = np.corrcoef(x, y)[0, 1]
        ref_slope = np.cov(x, y, ddof=0)[0, 1] / np.var(x)
        ref_inter = y.mean() - ref_slope * x.mean()
        corr_tol = 2.0 * n / np.sqrt(sxx * syy) + 2.0 * n / sxx
        slope_tol = 2.0 * n / sxx * (1.0 + abs(ref_slope))
        inter_tol = slope_tol * abs(x.mean()) + 1e-9 * abs(ref_inter)
        assert r.n == n
        assert abs(r.corr - ref_corr) <= corr_tol, (r.l_returnflag, corr_tol)
        assert abs(r.slope - ref_slope) <= slope_tol, (r.l_returnflag, slope_tol)
        assert abs(r.intercept - ref_inter) <= inter_tol, (
            r.l_returnflag,
            inter_tol,
        )


def test_split_assign_partitions_every_doc_once(spark):
    """The three splits tile the corpus: per-source doc counts sum to
    the source's total, and shares sum to 1 exactly (same-denominator
    divisions)."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators.llm_prep import docs_split_assign

    out = docs_split_assign(spark, SF_SMALL)
    per_source = out.groupBy("source").agg(
        F.sum("n_docs").alias("n"), F.sum("share_of_source").alias("share")
    )
    truth = (
        load_table(spark, SF_SMALL, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_true"))
    )
    joined = per_source.join(truth, "source").collect()
    assert joined
    for r in joined:
        assert r.n == r.n_true, r.source
        assert abs(r.share - 1.0) < 1e-12, r.source


def test_stats_ts_tail_oracle_parity(spark, sf_dir):
    """Pytest replica of the driver gate for the stats/time-series
    tails (they sit past the 50-slot driver window)."""
    from .oracle_utils import assert_query_matches_oracle

    for mod in (stats, timeseries):
        for name, (fn, orc) in mod.QUERIES_TAIL.items():
            assert_query_matches_oracle(fn(spark, sf_dir), orc, sf_dir)


def test_gram_matrix_matches_numpy(spark):
    """Upper-triangle X'X within the qsum quantization bound: each of
    the N per-vector products is floored on the 2^-24 grid, so every
    (i, j) cell sits within N·2^-24 of numpy's float64 sum (plus
    numpy's own rounding, far smaller). Also pins shape: exactly
    d(d+1)/2 distinct upper-triangle cells."""
    import numpy as np

    out = stats.embedding_gram_matrix(spark, SF_SMALL).collect()
    X = np.array(
        [
            r.embedding
            for r in load_table(spark, SF_SMALL, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    n, d = X.shape
    assert d == stats.GRAM_DIM
    ref = X.T @ X
    assert len(out) == d * (d + 1) // 2
    assert {(r.i, r.j) for r in out} == {
        (i, j) for i in range(1, d + 1) for j in range(i, d + 1)
    }
    tol = n * 2.0**-stats.GRAM_BITS + 1e-9
    for r in out:
        assert abs(r.gram - ref[r.i - 1, r.j - 1]) <= tol, (r.i, r.j)
