"""Second-moment statistics (EXT): Pearson correlation and a simple
OLS fit per group, made cross-engine bit-deterministic.

Why not ``F.corr`` / ``regr_slope``: both engines implement them with
DOUBLE accumulators whose merge order varies with partitioning — the
same nondeterminism the registry's decimal-sum rule exists for, but
baked into the builtin. This module computes the moments itself:
TWO-PASS CENTERED sums (means first, then Σ(x−x̄)(y−ȳ) etc.), each
accumulated in exact DECIMAL.

Two-pass centered rather than the one-pass raw-moment identity
(nΣxy−ΣxΣy): raw second moments of a 10⁵-magnitude column overflow
the 2^53-exact double range in the final decimal→double conversion
already at sf0.1 (the winsorized-means lesson: DuckDB's int128/10^N
conversion double-rounds past 2^53, measured 1 ulp) — centered
products are ~4 orders smaller, buying both headroom AND the
textbook numerical-stability argument (catastrophic cancellation of
nΣxy−ΣxΣy at high mean/σ ratios).

Determinism ledger: mean = exact-decimal sum → double → one division;
dx, dy = one double subtraction each; each product one rounding; the
product is then FLOOR'd before the decimal cast — floor is exactly
defined on doubles in both engines, whereas a fractional decimal cast
is NOT cross-engine stable (measured at sf0.01: one dy² product fell
on opposite sides of a 0.05 boundary under Java's exact-expansion
HALF_UP vs DuckDB's scaled-double path — a 0.1 absolute divergence in
Σ). Flooring makes the decimal sum exact integers and the final
conversion one correctly-rounded step (< 2^53 to ~10⁶ rows/group at
these magnitudes; larger corpora pre-scale dy by 2⁻ᵏ — exact — for
headroom). Accuracy: floor biases each term down by ~0.5, so
|ΔΣ| ≲ n/2 — negligible against Σdx² and Σdy² (positive terms), but
for Σdxdy the CANCELLATION in a weak correlation makes the bound
relative to n, not |Σ|: Δcorr ≲ n/√(Σdx²·Σdy²) ≈ 1/(n·σx·σy)·n ~
2e-4 per 10³ rows here — fine for a filtering statistic, stated
honestly (test_ols_matches_numpy_moments pins the bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table



def lineitem_qty_price_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return-flag: Pearson correlation of (quantity,
    extendedprice) and the OLS line price = slope·qty + intercept —
    the "is price linear in quantity, per segment" question every
    warehouse asks, as a deterministic declared query.

    Plan: pass 1 is one groupBy for n/means; the 3-row means table
    broadcasts back onto the scan (map-side centering — no second
    shuffle of the data, the join key is the groupBy key); pass 2 is
    one groupBy of three decimal product sums. Two scans, two tiny
    shuffles; at 100 TB both passes are embarrassingly parallel scans
    and the broadcast is |groups| rows."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    means = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("x").cast("decimal(18,2)")).cast("double")
            / F.count("*").cast("double")
        ).alias("mx"),
        (
            F.sum(F.col("y").cast("decimal(18,2)")).cast("double")
            / F.count("*").cast("double")
        ).alias("my"),
    )
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    dec = "decimal(38,0)"
    centered = (
        l.join(F.broadcast(means), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("n").alias("n"),
            F.first("mx").alias("mean_qty"),
            F.first("my").alias("mean_price"),
            F.sum(F.floor(dx * dy).cast(dec)).cast("double").alias("sxy"),
            F.sum(F.floor(dx * dx).cast(dec)).cast("double").alias("sxx"),
            F.sum(F.floor(dy * dy).cast(dec)).cast("double").alias("syy"),
        )
    )
    slope = F.col("sxy") / F.col("sxx")
    return centered.select(
        "l_returnflag",
        "n",
        "mean_qty",
        "mean_price",
        (F.col("sxy") / F.sqrt(F.col("sxx") * F.col("syy"))).alias("corr"),
        slope.alias("slope"),
        (F.col("mean_price") - slope * F.col("mean_qty")).alias("intercept"),
    )


LINEITEM_OLS_SQL = f"""
WITH means AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS my
  FROM lineitem GROUP BY 1
),
centered AS (
  SELECT l.l_returnflag, m.n, m.mx, m.my,
         CAST(SUM(CAST(FLOOR((l.l_quantity - m.mx) * (l.l_extendedprice - m.my))
                       AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(FLOOR((l.l_quantity - m.mx) * (l.l_quantity - m.mx))
                       AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(FLOOR((l.l_extendedprice - m.my) * (l.l_extendedprice - m.my))
                       AS DECIMAL(38,0))) AS DOUBLE) AS syy
  FROM lineitem l JOIN means m USING (l_returnflag)
  GROUP BY 1, 2, 3, 4
)
SELECT l_returnflag, n, mx AS mean_qty, my AS mean_price,
       sxy / SQRT(sxx * syy) AS corr,
       sxy / sxx AS slope,
       my - (sxy / sxx) * mx AS intercept
FROM centered
"""


GRAM_DIM = 64  # embedding dimensionality (asserted by the oracle's len())
GRAM_BITS = 24  # qsum quantization scale for the pair products


def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix G = Σᵥ v·vᵀ over the embedding corpus —
    the one-pass X'X every distributed PCA / covariance / whitening
    step starts from (d×d fits on the driver; the data never does).
    Emits the upper triangle as (i, j, gram), d(d+1)/2 = 2080 rows.

    Plan: map-side fan-out of each vector to its 2080 index-pair
    products — no self-join — then one hash aggregation on (i, j).
    Partial aggregation means the shuffle carries only
    (#partitions × 2080) partial sums no matter how many vectors
    there are, which is the whole trick: at 100 TB the network cost
    is constant in N. The fan-out is TWO chained `posexplode`
    generators (row i, then the tail slice from i) rather than a
    nested `transform` lambda: Catalyst higher-order functions run
    on the interpreted expression path, while generate + project
    stay inside whole-stage codegen — measured 4.5× warm at sf0.1
    (10.4M pair rows: ~1.8–3.4 s interpreted vs 0.4–0.7 s
    codegen'd), same rows either way. Products are
    qsum-quantized (exact 2^-24 grid) because a double Σ over a
    cluster is merge-order-dependent — the same determinism rule as
    the OLS moments above. A BLAS variant (per-partition numpy X'X
    via mapInPandas, the `similarity_fast` pattern) is the
    raw-throughput path; the declared query stays JVM-pure so the
    oracle can prove it bit-exact."""
    from ..functions.qsum import qsum

    e = load_table(spark, sf_dir, "embeddings")
    # p is 0-based: element i = p+1 (1-based), tail slice holds j = i..D
    ex = e.select("embedding", F.posexplode("embedding").alias("p", "xi"))
    pairs = ex.select(
        (F.col("p") + 1).cast("long").alias("i"),
        F.col("xi").cast("double").alias("x"),
        F.posexplode(F.expr(f"slice(embedding, p + 1, {GRAM_DIM} - p)")).alias(
            "q", "xj"
        ),
    )
    return (
        pairs.select(
            "i",
            (F.col("i") + F.col("q")).cast("long").alias("j"),
            (F.col("x") * F.col("xj").cast("double")).alias("p"),
        )
        .groupBy("i", "j")
        .agg(qsum(F.col("p"), GRAM_BITS).alias("gram"))
    )


def _gram_sql() -> str:
    from ..functions.qsum import qsum_sql

    return f"""
WITH idx AS (SELECT unnest(range(1, {GRAM_DIM + 1})) AS i),
pairs AS (SELECT a.i AS i, b.i AS j FROM idx a JOIN idx b ON b.i >= a.i),
prods AS (
  SELECT p.i, p.j,
         CAST(embedding[p.i] AS DOUBLE) * CAST(embedding[p.j] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN pairs p
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       {qsum_sql('v', GRAM_BITS)} AS gram
FROM prods GROUP BY i, j
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "lineitem_qty_price_ols": (lineitem_qty_price_ols, LINEITEM_OLS_SQL),
    "embedding_gram_matrix": (embedding_gram_matrix, _gram_sql()),
}
