"""Cross-document line dedup (r13): oracle parity, planted-boilerplate
removal, content-and-order preservation."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from robin_sparkles_spark.operators import line_dedup as L

from .oracle_utils import assert_query_matches_oracle


def test_line_dedup_oracle_parity(spark, sf_dir):
    assert_query_matches_oracle(
        L.docs_line_dedup(spark, sf_dir), L.docs_line_dedup_oracle, sf_dir
    )


def test_boilerplate_lines_removed_everywhere(spark, sf_dir):
    """Every planted doc must lose exactly its BOILER_LINES_PER_DOC
    boilerplate lines (pool df ≈ n/10 ≫ LINE_DUP_DF), unless its
    original text line is itself an organic ≥LINE_DUP_DF duplicate —
    then n_removed is one higher. No surviving clean text may contain
    the boilerplate marker."""
    out = {r.doc_id: r for r in L.docs_line_dedup(spark, sf_dir).collect()}
    corpus = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            L.build_line_dedup_corpus(spark, sf_dir)
        ).collect()
    }
    planted = [d for d in corpus if d % L.BOILER_EVERY == 0]
    assert planted
    for d in planted:
        assert out[d].n_removed >= L.BOILER_LINES_PER_DOC, (d, out[d])
    # reconstruct each doc's clean text independently and compare md5:
    # df over raw lines, drop >= LINE_DUP_DF, keep order
    from collections import Counter

    df = Counter()
    for text in corpus.values():
        for line in text.split("\n"):
            df[line] += 1
    for d, text in corpus.items():
        clean = "\n".join(
            ln for ln in text.split("\n") if df[ln] < L.LINE_DUP_DF
        )
        assert out[d].clean_md5 == hashlib.md5(clean.encode()).hexdigest(), d
        assert "boilerplate navigation line" not in clean


def test_unplanted_unique_docs_untouched(spark, sf_dir):
    """A doc whose lines are corpus-unique must come through with
    n_removed == 0 and the md5 of its original text."""
    out = L.docs_line_dedup(spark, sf_dir)
    corpus = spark.read.parquet(L.build_line_dedup_corpus(spark, sf_dir))
    joined = out.join(corpus, "doc_id").where(
        (F.col("n_removed") == 0)
    )
    rows = joined.select(
        "doc_id", "clean_md5", F.md5("text").alias("orig_md5")
    ).collect()
    assert rows  # non-vacuous: most docs are untouched
    for r in rows:
        assert r.clean_md5 == r.orig_md5, r.doc_id
