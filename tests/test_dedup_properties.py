"""Property-based fuzzing of the dedup family on GENERATED corpora:
the fixture gate proves parity on one distribution; these prove it on
arbitrary text — unicode words, empty docs, exact copies, single-word
docs — where hash/split edge cases would diverge first.

Each hypothesis example stages a documents.parquet under tmp and runs
the same cross-engine comparison as the driver gate (dedup reads only
the documents table, so a staged dir is a complete sf_dir for it)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from robin_sparkles_spark.operators import dedup

from .oracle_utils import assert_query_matches_oracle

# Words: ASCII + accented + CJK — md5 hashes UTF-8 bytes identically in
# both engines; split is on the single space char in both.
_WORDS = st.sampled_from(
    ["the", "cat", "sat", "über", "naïve", "数据", "x", "longerword", "Zebra42", ""]
)
_DOC = st.lists(_WORDS, min_size=0, max_size=12).map(" ".join)
# Duplicate-rich corpora: draw few distinct docs, repeat them.
_CORPUS = st.lists(_DOC, min_size=1, max_size=12).flatmap(
    lambda docs: st.lists(
        st.sampled_from(docs), min_size=len(docs), max_size=2 * len(docs)
    )
)


def _stage_corpus(tmp_dir, texts: list[str]) -> str:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["gen"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), f"{tmp_dir}/documents.parquet")
    return str(tmp_dir)


@given(texts=_CORPUS)
@settings(max_examples=6, deadline=None)  # each example runs Spark jobs
def test_ngram_oracle_parity_on_generated_corpora(spark, tmp_path_factory, texts):
    sf = _stage_corpus(tmp_path_factory.mktemp("corpus"), texts)
    fn, oracle = dedup.QUERIES["dedup_ngram_jaccard"]
    assert_query_matches_oracle(fn(spark, sf), oracle, sf, tables=("documents",))


@given(texts=_CORPUS)
@settings(max_examples=6, deadline=None)
def test_blocked_equals_bruteforce_on_generated_corpora(spark, tmp_path_factory, texts):
    sf = _stage_corpus(tmp_path_factory.mktemp("corpus"), texts)
    ngram = sorted(map(tuple, dedup.dedup_ngram_jaccard(spark, sf).collect()))
    brute = sorted(map(tuple, dedup.dedup_ngram_jaccard_bruteforce(spark, sf).collect()))
    assert ngram == brute
    blocked = sorted(map(tuple, dedup.dedup_simhash(spark, sf).collect()))
    nlj = sorted(map(tuple, dedup.dedup_simhash_bruteforce(spark, sf).collect()))
    assert blocked == nlj


@given(texts=_CORPUS)
@settings(max_examples=4, deadline=None)
def test_exact_dedup_oracle_parity_on_generated_corpora(
    spark, tmp_path_factory, texts
):
    sf = _stage_corpus(tmp_path_factory.mktemp("corpus"), texts)
    fn, oracle = dedup.QUERIES["dedup_exact"]
    assert_query_matches_oracle(fn(spark, sf), oracle, sf, tables=("documents",))
