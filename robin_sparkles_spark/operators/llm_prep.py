"""Training-mix preparation operators (EXT — BASELINE.json north
star): the decisions a pretraining data pipeline makes AFTER cleaning
— how much of each source to sample, how much padding a length
distribution costs, and how to draw a class-balanced subset.

Determinism rules as registry.py. The temperature reweighting uses
τ = 0.5, i.e. sqrt — deliberately: IEEE-754 sqrt is correctly rounded
in both engines, where a general pow(x, 0.7) is only faithfully
rounded and could differ in the last ulp between libm builds, which a
value-hash gate would catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.hashing import MERSENNE_P, affine_params
from ..sources import load_table

# fixed context-window ladder for the padding-waste report
PACK_BUCKETS = (32, 48, 64, 96, 128)
BALANCED_K = 20  # docs per language in the balanced sample


def _n_words() -> F.Column:
    toks = F.split(F.col("text"), " ")
    return F.size(F.filter(toks, lambda t: F.length(t) > 0)).cast("long")


def source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token counts and temperature-adjusted sampling
    weights — the domain-mixing table a pretraining run is configured
    from. ``raw_share`` is the source's fraction of corpus tokens;
    ``mix_weight`` is the τ=0.5 temperature reweighting
    share^τ / Σ share^τ that upsamples small sources (flattens the
    distribution) — the standard multi-source mixing move. One
    aggregation over documents + a broadcast 1-row total; exact long
    token sums, divisions in double."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", _n_words().alias("n_words")
    )
    per_src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_words").alias("tokens")
    )
    # sqrt terms are doubles, so their SUM must ride a fixed-scale
    # decimal (order-independent) — a raw double sum diverged 1 ulp
    # between engines on the first full-gate run. Scale 10 keeps the
    # unscaled sum < 2^53 far beyond any fixture SF.
    tot = per_src.agg(
        F.sum("tokens").cast("double").alias("total_tokens"),
        F.sum(F.sqrt(F.col("tokens").cast("double")).cast("decimal(38,10)"))
        .cast("double")
        .alias("sum_sqrt"),
    )
    share = F.col("tokens").cast("double") / F.col("total_tokens")
    weight = F.sqrt(F.col("tokens").cast("double")) / F.col("sum_sqrt")
    return (
        per_src.crossJoin(F.broadcast(tot))  # scalar shape, see q11/q22
        .select(
            "source",
            "n_docs",
            "tokens",
            share.alias("raw_share"),
            weight.alias("mix_weight"),
        )
    )


SOURCE_MIXTURE_SQL = """
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(list_filter(string_split(text, ' '), t -> len(t) > 0))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(tokens) AS DOUBLE) AS total_tokens,
         CAST(SUM(CAST(sqrt(CAST(tokens AS DOUBLE)) AS DECIMAL(38,10))) AS DOUBLE) AS sum_sqrt
  FROM per_src
)
SELECT p.source, p.n_docs, p.tokens,
       CAST(p.tokens AS DOUBLE) / t.total_tokens AS raw_share,
       sqrt(CAST(p.tokens AS DOUBLE)) / t.sum_sqrt AS mix_weight
FROM per_src p CROSS JOIN tot t
"""


def padding_waste_by_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding cost of a fixed context-window ladder: each document is
    assigned the SMALLEST bucket ≥ its token count (longest docs fall
    into the top bucket, truncated there — the usual max-length rule),
    and the report aggregates tokens vs padded slots per (lang,
    bucket). ``waste_pct`` is the number a packing strategy (concat +
    document-boundary masking) would reclaim — the measurement that
    motivates sequence packing in the first place. Pure projections +
    one aggregation; no shuffle beyond the groupBy."""
    ladder = list(PACK_BUCKETS)
    top = ladder[-1]
    bucket = F.lit(top)
    for b in reversed(ladder[:-1]):
        bucket = F.when(F.col("n_words") <= b, F.lit(b)).otherwise(bucket)
    capped = F.least(F.col("n_words"), F.lit(top))
    d = load_table(spark, sf_dir, "documents").select(
        "lang", _n_words().alias("n_words")
    )
    return (
        d.select("lang", bucket.alias("bucket"), capped.alias("kept"))
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").alias("tokens_kept"),
            (F.sum(F.col("bucket") - F.col("kept"))).alias("pad_tokens"),
        )
        .select(
            "lang",
            "bucket",
            "n_docs",
            "tokens_kept",
            "pad_tokens",
            (
                F.col("pad_tokens").cast("double")
                / (F.col("tokens_kept") + F.col("pad_tokens")).cast("double")
            ).alias("waste_pct"),
        )
    )


def _padding_sql() -> str:
    ladder = list(PACK_BUCKETS)
    top = ladder[-1]
    cases = " ".join(f"WHEN n_words <= {b} THEN {b}" for b in ladder[:-1])
    return f"""
WITH d AS (
  SELECT lang,
         CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS BIGINT) AS n_words
  FROM documents
),
b AS (
  SELECT lang,
         CASE {cases} ELSE {top} END AS bucket,
         LEAST(n_words, {top}) AS kept
  FROM d
)
SELECT lang, bucket, COUNT(*) AS n_docs,
       CAST(SUM(kept) AS BIGINT) AS tokens_kept,
       CAST(SUM(bucket - kept) AS BIGINT) AS pad_tokens,
       CAST(SUM(bucket - kept) AS DOUBLE)
       / CAST(SUM(kept) + SUM(bucket - kept) AS DOUBLE) AS waste_pct
FROM b
GROUP BY lang, bucket
"""


def docs_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced subset: exactly min(K, n) documents per
    language, chosen by deterministic hash rank (affine family — the
    same engine-portable randomness as the sketches). The complement
    of ``docs_stable_sample``'s per-class RATES: rebalancing draws a
    fixed COUNT per class regardless of class frequency, the move that
    equalizes low-resource languages in a mix. Per-class top-K via a
    bounded window — the partition key is the class, so no global
    sort."""
    a, b = affine_params(3)
    h = (F.col("doc_id") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", h.alias("h")
    )
    w = W.partitionBy("lang").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= BALANCED_K)
        .select("doc_id", "lang", F.col("rank").cast("long").alias("rank"))
    )


def _balanced_sql() -> str:
    a, b = affine_params(3)
    return f"""
WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY (doc_id * {a} + {b}) % {MERSENNE_P} ASC,
                                     doc_id ASC) AS rank
  FROM documents
)
SELECT doc_id, lang, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {BALANCED_K}
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "source_mixture": (source_mixture, SOURCE_MIXTURE_SQL),
    "padding_waste_by_bucket": (padding_waste_by_bucket, _padding_sql()),
    "docs_balanced_sample": (docs_balanced_sample, _balanced_sql()),
}
