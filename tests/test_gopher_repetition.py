"""Gopher §A1.2 repetition battery (r15 — VERDICT r14 #3): oracle
parity plus semantic pins on the planted corpus — the planting rules
are deterministic functions of doc_id, so their footprint in the
output is closed-form checkable without re-deriving any n-gram math.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robin_sparkles_spark.operators import gopher_repetition as G
from tests.oracle_utils import assert_query_matches_oracle

ALL = G.QUERIES


@pytest.mark.parametrize("name", sorted(ALL))
def test_oracle_parity(spark, sf_dir, name):
    fn, oracle = ALL[name]
    assert_query_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)


@pytest.fixture(scope="module")
def rep(spark, sf_dir):
    return (
        G.docs_gopher_repetition_flags(spark, sf_dir).cache()
    )


def test_planted_dup_lines_fire(rep):
    """Every doc_id % 3 == 0 doc repeats its first line in staging, so
    its duplicate-line count is ≥ 1; a doc divisible by neither plant
    modulus has NO planted repetition, and synthetic 8-word lines from
    the fixture vocabulary essentially never repeat organically — so
    unplanted docs sit at 0 duplicate lines."""
    planted = rep.where(F.col("doc_id") % G.REP_DUP_LINE_EVERY == 0)
    assert planted.where(F.col("dup_lines") < 1).count() == 0
    clean = rep.where(
        (F.col("doc_id") % G.REP_DUP_LINE_EVERY != 0)
        & (F.col("doc_id") % G.REP_DUP_PARA_EVERY != 0)
    )
    assert clean.where(F.col("dup_lines") > 0).count() == 0
    assert clean.where(F.col("dup_paras") > 0).count() == 0


def test_planted_dup_paras_fire(rep):
    """Paragraph planting duplicates the whole first paragraph — the
    duplicate-paragraph count is ≥ 1 and, because that paragraph's
    lines come along, the duplicated n-gram coverage for every n in
    DUP_NS is > 0 (an 8+-word paragraph contains a repeated n-gram of
    every battery width)."""
    planted = rep.where(F.col("doc_id") % G.REP_DUP_PARA_EVERY == 0)
    assert planted.where(F.col("dup_paras") < 1).count() == 0
    for n in G.DUP_NS:
        assert planted.where(F.col(f"dup{n}_chars") <= 0).count() == 0


def test_flag_battery_is_not_vacuous(rep):
    """Both polarities of every line/para flag and of the dup-ngram
    flags exist in the fixture output — the battery discriminates."""
    for flag in ("dup_line_ok", "dup_line_char_ok", "dup_para_char_ok", "keep"):
        vals = {r[0] for r in rep.select(flag).distinct().collect()}
        assert vals == {True, False}, f"{flag} is vacuous: {vals}"


def test_keep_is_conjunction(rep):
    flags = [
        "dup_line_ok",
        "dup_para_ok",
        "dup_line_char_ok",
        "dup_para_char_ok",
        *[f"top{n}_ok" for n in G.TOP_NS],
        *[f"dup{n}_ok" for n in G.DUP_NS],
    ]
    conj = None
    for f_ in flags:
        conj = F.col(f_) if conj is None else (conj & F.col(f_))
    assert rep.where(F.col("keep") != conj).count() == 0


def test_staging_is_idempotent_and_fingerprinted(spark, sf_dir):
    p1 = G.build_gopher_rep_corpus(spark, sf_dir)
    p2 = G.build_gopher_rep_corpus(spark, sf_dir)
    assert p1 == p2
    assert "gopher_rep_docs" in p1


def test_ngram_fold_matches_explode_groupby(spark, sf_dir):
    """r15 fold-rewrite pin: the sorted-run ``aggregate`` fold
    (_ngram_fold_sql) must reproduce the retired explode →
    groupBy(doc_id, n, gram) → max(struct(cnt, cov)) / Σ(cov | cnt≥2)
    pipeline EXACTLY on the full staged corpus — run-length over a
    sorted array ≡ COUNT(*) GROUP BY gram, and the fold's update
    branch carries the same (count, coverage)-lexicographic top tie
    rule. Guards the rewrite against any future drift in either the
    fold SQL or the tie rule."""
    corpus = spark.read.parquet(G.build_gopher_rep_corpus(spark, sf_dir))
    words_arr = F.filter(F.split("text", "\\s+"), lambda x: F.length(x) > 0)
    base = corpus.select("doc_id", words_arr.alias("words"))
    ns = G.TOP_NS + G.DUP_NS

    fold = base.select(
        "doc_id", *[F.expr(G._ngram_fold_sql(n)).alias(f"s{n}") for n in ns]
    ).select(
        "doc_id",
        *[F.col(f"s{n}.tv").alias(f"top{n}") for n in G.TOP_NS],
        *[F.col(f"s{n}.dv").alias(f"dup{n}") for n in G.DUP_NS],
    )

    streams = [
        F.expr(
            f"CASE WHEN size(words) >= {n} THEN "
            f"transform(sequence(1, size(words) - {n} + 1), "
            f"i -> struct({n} AS n, array_join(slice(words, i, {n}), ' ') AS g)) "
            "ELSE array() END"
        )
        for n in ns
    ]
    ex = base.select(
        "doc_id", F.explode(F.flatten(F.array(*streams))).alias("s")
    ).select("doc_id", F.col("s.n").alias("n"), F.col("s.g").alias("g"))
    grp = ex.groupBy("doc_id", "n", "g").agg(F.count(F.lit(1)).alias("cnt"))
    cov = F.col("cnt") * F.length("g").cast("long")
    per_n = grp.groupBy("doc_id", "n").agg(
        F.max(F.struct(F.col("cnt").alias("c"), cov.alias("v")))
        .getField("v")
        .alias("top_cov"),
        F.sum(
            F.when(F.col("cnt") >= 2, cov).otherwise(F.lit(0).cast("long"))
        ).alias("dup_cov"),
    )
    ref = per_n.groupBy("doc_id").agg(
        *[
            F.coalesce(F.max(F.when(F.col("n") == n, F.col("top_cov"))), F.lit(0))
            .cast("long")
            .alias(f"top{n}")
            for n in G.TOP_NS
        ],
        *[
            F.coalesce(F.max(F.when(F.col("n") == n, F.col("dup_cov"))), F.lit(0))
            .cast("long")
            .alias(f"dup{n}")
            for n in G.DUP_NS
        ],
    )
    assert fold.exceptAll(ref).count() == 0
    assert ref.exceptAll(fold).count() == 0
