"""Repeated-span removal (r11 — Lee et al.'s surgery half):
consistency, repeated-mass elimination, and untouched-doc identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from robin_sparkles_spark.operators import ngram_lm as N
from robin_sparkles_spark.sources import load_table


def _repeated_mass(toks):
    """(total occurrences of corpus-repeated K-windows, distinct
    repeated grams) over a (doc_id, ws) frame."""
    grams = toks.where(F.size("ws") >= N.SPAN_K).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(ws) - {N.SPAN_K}),"
                f" i -> CAST(conv(substring(md5("
                f"array_join(slice(ws, i + 1, {N.SPAN_K}), ' ')"
                f"), 1, 15), 16, 10) AS BIGINT))"
            )
        ).alias("pos", "g"),
    )
    occ = grams.groupBy("g").agg(F.count("*").alias("occ"))
    row = occ.agg(
        F.sum(F.when(F.col("occ") >= 2, F.col("occ"))).alias("rep_occ"),
        F.count(F.when(F.col("occ") >= 2, 1)).alias("rep_grams"),
    ).collect()[0]
    return row.rep_occ or 0, row.rep_grams or 0


def _cleaned_toks(spark, sf_dir):
    return N.docs_scrub_repeated_spans(spark, sf_dir).select(
        "doc_id",
        F.filter(F.split("cleaned_text", " "), lambda t: t != "").alias("ws"),
        "n_tokens",
        "n_removed",
    )


def test_scrub_counts_consistent(spark, sf_dir):
    """n_removed is exactly the token-count delta for every doc."""
    bad = (
        _cleaned_toks(spark, sf_dir)
        .where(F.col("n_removed") != F.col("n_tokens") - F.size("ws"))
        .count()
    )
    assert bad == 0


def test_scrub_eliminates_repeated_mass(spark, sf_dir):
    """The intervention works: corpus-repeated K-window occurrences
    collapse after the scrub (exactly 0 on this fixture — the kept
    first copies become unique; the gate allows a 5% remnant because
    keep-first does not STRUCTURALLY guarantee zero when cut runs of
    different grams overlap a first occurrence)."""
    orig = load_table(spark, sf_dir, "documents").select(
        "doc_id", N._lc_tokens().alias("ws")
    )
    rep_before, _ = _repeated_mass(orig)
    assert rep_before > 0, "fixture must contain repeated spans"
    rep_after, _ = _repeated_mass(
        _cleaned_toks(spark, sf_dir).select("doc_id", "ws")
    )
    assert rep_after * 20 <= rep_before, (
        f"scrub left {rep_after}/{rep_before} repeated windows"
    )


def test_scrub_untouched_docs_identical(spark, sf_dir):
    """Docs with no qualifying run come back as their normalized
    token stream verbatim."""
    orig = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_join(N._lc_tokens(), " ").alias("norm_text")
    )
    out = N.docs_scrub_repeated_spans(spark, sf_dir)
    mismatched = (
        out.where("n_removed = 0")
        .join(orig, "doc_id")
        .where(F.col("cleaned_text") != F.col("norm_text"))
        .count()
    )
    assert mismatched == 0
    assert out.where("n_removed > 0").count() > 0, "fixture must scrub"
