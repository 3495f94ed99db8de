"""Distributed BPE merge training (EXT — tokenizer-prep capstone).

The first ``BPE_ITERS`` merges of byte-pair-encoding training over the
document corpus, exactly as the original algorithm defines them
(Sennrich et al. 2016): represent every word as a space-separated
symbol sequence, count adjacent symbol pairs weighted by word
frequency, merge the most frequent pair corpus-wide, repeat. This sits
on top of the existing tokenizer-prep family (``corpus_vocabulary``,
``bigram_stats``, ``docs_rarity_topk``) and is the step that actually
LEARNS subwords instead of describing words.

Scale design — the classic BPE trick, made explicit:

- Pair counting runs over the DISTINCT-WORD table with frequencies,
  not the corpus: the corpus may be 100 TB but the weighted vocabulary
  is millions of rows, so each iteration is a vocab-scale explode +
  one hash aggregation (sum partial-aggregates map-side).
- The argmax merge is a ``TakeOrderedAndProject`` over |distinct
  pairs| rows with a TOTAL tie-break (count DESC, left ASC, right
  ASC) — deterministic across engines and partitionings — and the
  single winning row is collected driver-side per iteration, the same
  tiny model-fit collect as ``clustering.kmeans_fit`` (a k-row
  centroid table there, a 1-row merge table here).
- The merge application is a DOUBLE-DELIMITED boundary-anchored
  ``replace`` projection over the vocabulary (see ``_apply_merge``):
  symbols are joined by TWO spaces and the string padded with two
  more, so every boundary owns a delimiter *pair*; the pattern
  ' l  r ' → ' lr ' consumes the inner space of each flanking
  boundary and the replacement restores it. Because adjacent matches
  no longer share a delimiter, one left-to-right non-overlapping
  replace IS greedy BPE exactly — including self-pair merges over
  runs of identical symbols ('ooooo' + (o,o) → 'oo oo o'), where the
  r5 single-space fixpoint construction diverged (it gave
  'oo o oo'; an r6 review caught it, and a 400k-case randomized
  simulation pins the new construction equal to token-list greedy
  BPE, chained merges included). A bare single-space replace would
  also merge across symbol boundaries ('th e y' + (h,e) → 'the y').
  Iteration i+1's input is a same-size map-only transform of
  iteration i's.

Oracle: the DuckDB twin unrolls the same ``BPE_ITERS`` iterations as
chained CTEs, computing each winning pair WITH SCALAR SUBQUERIES — the
oracle derives the merges itself rather than having the fitted result
inlined, so the gate re-runs the whole training loop in SQL and the
hash proves Spark's distributed loop equals it end-to-end (stronger
than the k-means centroid-literal pattern, feasible here because the
model state per iteration is one row).

Determinism ledger: symbol sequences are exact strings; counts are
exact longs; the tie-break is total; `replace` semantics match; no
doubles anywhere.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.barrier import barrier
from ..functions.text import ws_tokens, ws_tokens_sql
from ..sources import load_table

# r12 (VERDICT r11 ask #7): raised 3 → 32 merges — past demo count,
# with the per-merge cost MEASURED (FIT_COST_LOG below; table in
# BASELINE.md "BPE merge-cost"). The loop stays deliberately
# sequential: each merge is one vocab-scale pair aggregation + a
# 1-row TakeOrdered collect (same tiny model-fit collect as
# kmeans_fit), and classic BPE's merge i+1 DEPENDS on merge i's
# rewrite — batching non-conflicting merges changes which pairs exist
# and breaks the Sennrich semantics the pure-Python reference test
# pins (tests/test_llm_ops.py::test_bpe_merges_match_python_reference
# runs the identical 32 iterations tokenlist-greedy). The measured
# per-merge cost is the documented boundary for a 30k-merge
# production vocab: cost ≈ const × merges, driver round-trips
# included — see BASELINE.md for the numbers.
BPE_ITERS = 32
# cut the chained-replace lineage every N merges: iteration i's pair
# count otherwise re-evaluates i nested replaces over the vocab
# (O(iters²) replace work + a 32-deep plan by the end)
BPE_REBARRIER = 8

# memoized merges per sf_dir — the gate calls the query function
# several times (compare + count) and the merges are pure functions of
# the corpus; same pattern as clustering._FIT_CACHE
_BPE_CACHE: dict[str, list[tuple[str, str, int]]] = {}
# per-merge wall seconds for the LAST fit per sf_dir (measurement
# surface for the BASELINE.md cost table; not part of any query)
FIT_COST_LOG: dict[str, list[float]] = {}


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(ws_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency."""
    toks = F.split(F.col("seq"), SEQ_SEP)
    lefts = F.slice(toks, 1, F.size(toks) - 1)
    rights = F.slice(toks, 2, F.size(toks) - 1)
    pairs = F.zip_with(
        lefts,
        rights,
        lambda x, y: F.struct(x.alias("s1"), y.alias("s2")),
    )
    return (
        seqs.select("n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
        .agg(F.sum("n").alias("cnt"))
    )


# Symbols are joined with a DOUBLE space so each inter-symbol boundary
# owns its own delimiter pair; the merge pattern ' l  r ' consumes one
# space from each flank and the replacement ' lr ' puts them back.
# Why double, not single: with single-space joins, adjacent matches
# SHARE a delimiter ('a b a b': both 'a b' occurrences own the middle
# space), so a left-to-right non-overlapping replace skips the second
# occurrence, and the r5 fixpoint iteration then diverged from greedy
# BPE on self-pair merges over identical-symbol runs ('ooooo' + (o,o)
# fixpointed to 'oo o oo' where greedy gives 'oo oo o' — ADVICE r5).
# With doubled delimiters no two matches share a character, so ONE
# non-overlapping replace is exactly Sennrich's greedy left-to-right
# merge — no fixpoint loop, boundary cases included (a merged token
# is l+r, which can never equal l, so it cannot re-match within the
# pass). tests/test_llm_ops.py pins the equivalence against a pure
# token-list reference, including the 'ooooo' shapes.
SEQ_SEP = "  "


def _apply_merge(seq: F.Column, l: str, r: str) -> F.Column:
    s = F.concat(F.lit(SEQ_SEP), seq, F.lit(SEQ_SEP))
    s = F.replace(s, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
    return F.trim(s)


def _fit_merges(spark: SparkSession, sf_dir: str) -> list[tuple[str, str, int]]:
    if sf_dir in _BPE_CACHE:
        return _BPE_CACHE[sf_dir]
    chars = F.filter(F.split(F.col("word"), ""), lambda c: F.length(c) > 0)
    # localCheckpoint: every iteration's collect() would otherwise
    # replay the corpus scan + tokenize + word groupBy from parquet —
    # the barrier makes iterations genuinely vocab-scale (the
    # kmeans_fit lesson, r5 review)
    seqs = barrier(
        _word_freqs(spark, sf_dir).select(
            F.array_join(chars, SEQ_SEP).alias("seq"), "n"
        ),
        "vocab",
        "BPE distinct-word sequences",
    )
    merges: list[tuple[str, str, int]] = []
    costs: list[float] = []
    for it in range(BPE_ITERS):
        t0 = time.monotonic()
        top = (
            _pair_counts(seqs)
            .orderBy(F.col("cnt").desc(), F.col("s1").asc(), F.col("s2").asc())
            .limit(1)
            .collect()
        )
        if not top:
            # degenerate corpus (e.g. all single-symbol words): no
            # adjacent pairs left — emit fewer merges rather than
            # IndexError (ADVICE r5); the SQL twin's empty-m{i}
            # UNION legs likewise emit no rows
            break
        best = top[0]
        merges.append((best.s1, best.s2, best.cnt))
        seqs = seqs.select(
            _apply_merge(F.col("seq"), best.s1, best.s2).alias("seq"), "n"
        )
        if (it + 1) % BPE_REBARRIER == 0:
            seqs = barrier(
                seqs, "vocab", "BPE re-barriered merge sequences"
            )
        costs.append(round(time.monotonic() - t0, 4))
    FIT_COST_LOG[sf_dir] = costs
    _BPE_CACHE[sf_dir] = merges
    return merges


def bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first ``BPE_ITERS`` learned merges: (merge_rank, lsym,
    rsym, merged, pair_count). See module docstring for the plan and
    the oracle's re-derivation of the same loop in SQL."""
    merges = _fit_merges(spark, sf_dir)
    rows = [
        (i + 1, l, r, l + r, int(c)) for i, (l, r, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "merge_rank long, lsym string, rsym string, merged string, pair_count long"
    )


def _iter_sql(i: int) -> str:
    """CTE block for iteration i (1-based): pairs → argmax → merged seqs."""
    prev = f"seq{i - 1}"
    # COALESCE with an unmatchable sentinel (chr(1) never occurs in a
    # sequence) so an EMPTY m{i} — fewer distinct pairs than BPE_ITERS
    # on a degenerate corpus — makes the replace a no-op instead of
    # NULLing every seq via NULL scalar subqueries (ADVICE r5); the
    # final UNION leg over the empty m{i} then emits no row, matching
    # the Spark loop's early break.
    merged_expr = (
        f"replace('{SEQ_SEP}' || seq || '{SEQ_SEP}',"
        f" COALESCE((SELECT ' ' || s1 || '{SEQ_SEP}' || s2 || ' ' FROM m{i}), chr(1)),"
        f" COALESCE((SELECT ' ' || s1 || s2 || ' ' FROM m{i}), chr(1)))"
    )
    return f"""
p{i} AS (
  SELECT t.toks[g.i] AS s1, t.toks[g.i + 1] AS s2, SUM(t.n) AS cnt
  FROM (SELECT string_split(seq, '{SEQ_SEP}') AS toks, n FROM {prev}) t,
       LATERAL (SELECT unnest(range(1, len(t.toks))) AS i) g
  GROUP BY 1, 2
),
-- MATERIALIZED: DuckDB inlines CTEs by default, and m{i} is
-- referenced by both scalar subqueries of the replace below —
-- inlining re-evaluates the whole upstream chain per reference
-- (exponential across iterations; the triangle-oracle lesson)
m{i} AS MATERIALIZED (
  SELECT s1, s2, cnt FROM p{i}
  ORDER BY cnt DESC, s1 ASC, s2 ASC LIMIT 1
),
seq{i} AS MATERIALIZED (
  -- * REPLACE keeps any carried columns (the tokenize oracle's seq0
  -- also carries `word`; the training oracle's carries only seq, n).
  -- The merge is the double-delimited ' l  r ' -> ' lr ' replace
  -- (see _apply_merge) — one non-overlapping pass IS greedy BPE
  -- because no two matches share a delimiter.
  SELECT * REPLACE (trim({merged_expr}) AS seq)
  FROM {prev}
)"""


def _bpe_sql() -> str:
    iters = ",".join(_iter_sql(i) for i in range(1, BPE_ITERS + 1))
    finals = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, s1 AS lsym, s2 AS rsym,"
        f" s1 || s2 AS merged, CAST(cnt AS BIGINT) AS pair_count FROM m{i}"
        for i in range(1, BPE_ITERS + 1)
    )
    return f"""
WITH words AS (
  SELECT word, COUNT(*) AS n
  FROM (SELECT unnest({ws_tokens_sql()}) AS word FROM documents)
  GROUP BY word
),
seq0 AS (
  SELECT array_to_string(string_split(word, ''), '{SEQ_SEP}') AS seq, n FROM words
),{iters}
SELECT CAST(merge_rank AS BIGINT) AS merge_rank, lsym, rsym, merged, pair_count
FROM ({finals})
"""


def docs_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merges — the train→apply round trip: per
    document, whitespace-token count vs subword count under the
    ``BPE_ITERS`` learned merges, plus the resulting subwords-per-
    token ratio (the compression a tokenizer buys; 1.0 merges
    nothing, chars-per-token merges everything).

    Plan — the apply side of the vocab-scale trick: subword counts
    are computed ONCE per distinct word (vocab-sized projection
    through the anchored merge replaces, merges inlined as literals
    from the memoized fit) and broadcast-joined onto the per-doc word
    explode; the explode is checkpointed and the vocabulary derives
    from IT, so the apply pays exactly one corpus scan + one
    broadcast join + one doc aggregation (the fit's own scan is
    memoized per sf_dir). Oracle re-derives the merges via the same
    unrolled CTE chain as the training oracle — sharing its `tok`
    scan — and joins the final vocabulary back to the documents: the
    whole train→apply path replayed in SQL."""
    return _bpe_per_doc(spark, sf_dir).select(
        "doc_id",
        "n_tokens",
        "n_subwords",
        (
            F.col("n_subwords").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("subwords_per_token"),
    )


def _bpe_per_doc(
    spark: SparkSession, sf_dir: str, extra_cols: "tuple[str, ...]" = ()
) -> DataFrame:
    """(doc_id, *extra_cols, n_tokens, n_subwords) under the learned
    merges — the apply pipeline of :func:`docs_bpe_tokenize`, factored
    (r15) so consumers can ride doc-functional columns (``lang``)
    through the explode + per-doc aggregation instead of re-scanning
    documents and attaching them with a corpus-side doc_id shuffle
    join (guide §2.4; grouping by (doc_id, extra) ≡ grouping by
    doc_id when extra is functionally dependent on doc_id)."""
    merges = _fit_merges(spark, sf_dir)
    chars = F.filter(F.split(F.col("word"), ""), lambda c: F.length(c) > 0)
    seq = F.array_join(chars, SEQ_SEP)
    for s1, s2, _ in merges:
        seq = _apply_merge(seq, s1, s2)
    # ONE corpus scan: the per-doc explode is checkpointed and the
    # DISTINCT-word vocabulary derives from it (an r5 review caught
    # a second scan via _word_freqs here — and the frequency column
    # it carried was never used by the apply side)
    d = barrier(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", *extra_cols, F.explode(ws_tokens()).alias("word")
        ),
        "corpus",
        "BPE-apply per-doc token explode",
        eager=False,
    )
    word_sub = d.select("word").distinct().select(
        "word", (F.size(F.split(seq, SEQ_SEP))).cast("long").alias("n_sub")
    )
    return (
        d.join(F.broadcast(word_sub), "word")
        .groupBy("doc_id", *extra_cols)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("n_sub").alias("n_subwords"),
        )
    )


def _bpe_tokenize_sql() -> str:
    iters = ",".join(_iter_sql(i) for i in range(1, BPE_ITERS + 1))
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, unnest({ws_tokens_sql()}) AS word FROM documents
),
words AS MATERIALIZED (
  SELECT word, COUNT(*) AS n FROM tok GROUP BY word
),
seq0 AS (
  SELECT word, array_to_string(string_split(word, ''), '{SEQ_SEP}') AS seq, n
  FROM words
),{iters},
word_sub AS (
  SELECT word, CAST(len(string_split(seq, '{SEQ_SEP}')) AS BIGINT) AS n_sub
  FROM seq{BPE_ITERS}
)
SELECT t.doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(w.n_sub) AS BIGINT) AS n_subwords,
       CAST(SUM(w.n_sub) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS subwords_per_token
FROM tok t JOIN word_sub w USING (word)
GROUP BY t.doc_id
"""


def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: subwords emitted per
    whitespace word under the learned merges, aggregated per ``lang``
    — the standard multilingual-tokenizer equity metric (a language
    with fertility 2× pays twice the sequence length per word, i.e.
    half the effective context window; the number a vocab-size /
    mix-weight decision reads). NOTE the fixture corpus is synthetic
    (every lang draws from one vocabulary), so per-lang values here
    are near-identical — the operator is the point, exercised and
    hash-checked on real columns.

    Plan (r15, guide §2.4): reuses the train→apply per-doc counts
    with ``lang`` riding the explode + per-doc aggregation
    (``_bpe_per_doc(extra_cols=("lang",))`` — lang is functionally
    dependent on doc_id, so grouping by (doc_id, lang) is the same
    grouping), then reduces to a |langs|-row aggregate. The previous
    form re-scanned documents for a thin (doc_id, lang) projection
    and attached it with a corpus-side doc_id shuffle join; output
    hash-identical."""
    return (
        _bpe_per_doc(spark, sf_dir, extra_cols=("lang",))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_subwords").alias("n_subwords"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_subwords",
            (
                F.col("n_subwords").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("fertility"),
        )
    )


def _bpe_fertility_sql() -> str:
    return f"""
WITH per_doc AS ({_bpe_tokenize_sql()})
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(p.n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(p.n_subwords) AS BIGINT) AS n_subwords,
       CAST(SUM(p.n_subwords) AS DOUBLE) / CAST(SUM(p.n_tokens) AS DOUBLE)
         AS fertility
FROM per_doc p JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "bpe_merge_training": (bpe_merge_training, _bpe_sql()),
    "docs_bpe_tokenize": (docs_bpe_tokenize, _bpe_tokenize_sql()),
    "bpe_fertility_by_lang": (bpe_fertility_by_lang, _bpe_fertility_sql()),
}
