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
- The merge application is a sentinel-padded, boundary-anchored
  iterated ``replace`` projection over the vocabulary (see
  ``_apply_merge``: ' l r ' → ' lr ' to fixpoint — a bare substring
  replace would merge across symbol boundaries, e.g. 'th e y' +
  (h,e) → 'the y'), so iteration i+1's input is a same-size map-only
  transform of iteration i's.

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

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import ws_tokens, ws_tokens_sql
from ..sources import load_table

BPE_ITERS = 3

# memoized merges per sf_dir — the gate calls the query function
# several times (compare + count) and the merges are pure functions of
# the corpus; same pattern as clustering._FIT_CACHE
_BPE_CACHE: dict[str, list[tuple[str, str, int]]] = {}


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(ws_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency."""
    toks = F.split(F.col("seq"), " ")
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


# A bare `replace(seq, 'l r', 'lr')` merges ACROSS symbol boundaries
# ('th e y' + merge (h,e) -> 'the y': the tail of symbol 'th' is not
# an adjacent pair, an r5 review caught this with that reproduction).
# Correct anchoring without lookarounds (DuckDB's RE2 has none): pad
# the sequence with sentinel spaces and replace the fully-delimited
# ' l r ' -> ' lr '. One pass can still miss matches whose leading
# delimiter was consumed as a previous match's trailing delimiter
# ('a b a b': the two occurrences share the middle space), so the
# replace iterates MERGE_PASSES times to fixpoint. This EQUALS greedy
# left-to-right BPE: replacements preserve both boundary spaces, a
# consumed token can never re-match, and any still-valid pair's
# ' l r ' text survives verbatim until a later pass takes it (the
# pure-token-list reference in tests/test_llm_ops.py pins the
# equivalence). Words cap out far below 2*MERGE_PASSES symbols, so
# the fixpoint always lands.
MERGE_PASSES = 8


def _apply_merge(seq: F.Column, l: str, r: str) -> F.Column:
    s = F.concat(F.lit(" "), seq, F.lit(" "))
    for _ in range(MERGE_PASSES):
        s = F.replace(s, F.lit(f" {l} {r} "), F.lit(f" {l}{r} "))
    return F.trim(s)


def _fit_merges(spark: SparkSession, sf_dir: str) -> list[tuple[str, str, int]]:
    if sf_dir in _BPE_CACHE:
        return _BPE_CACHE[sf_dir]
    chars = F.filter(F.split(F.col("word"), ""), lambda c: F.length(c) > 0)
    # localCheckpoint: every iteration's collect() would otherwise
    # replay the corpus scan + tokenize + word groupBy from parquet —
    # the barrier makes iterations genuinely vocab-scale (the
    # kmeans_fit lesson, r5 review)
    seqs = (
        _word_freqs(spark, sf_dir)
        .select(F.array_join(chars, " ").alias("seq"), "n")
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(BPE_ITERS):
        best = (
            _pair_counts(seqs)
            .orderBy(F.col("cnt").desc(), F.col("s1").asc(), F.col("s2").asc())
            .limit(1)
            .collect()[0]
        )
        merges.append((best.s1, best.s2, best.cnt))
        seqs = seqs.select(
            _apply_merge(F.col("seq"), best.s1, best.s2).alias("seq"), "n"
        )
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
    merged_expr = f"' ' || seq || ' '"
    for _ in range(MERGE_PASSES):
        merged_expr = (
            f"replace({merged_expr},"
            f" (SELECT ' ' || s1 || ' ' || s2 || ' ' FROM m{i}),"
            f" (SELECT ' ' || s1 || s2 || ' ' FROM m{i}))"
        )
    return f"""
p{i} AS (
  SELECT t.toks[g.i] AS s1, t.toks[g.i + 1] AS s2, SUM(t.n) AS cnt
  FROM (SELECT string_split(seq, ' ') AS toks, n FROM {prev}) t,
       LATERAL (SELECT unnest(range(1, len(t.toks))) AS i) g
  GROUP BY 1, 2
),
-- MATERIALIZED: DuckDB inlines CTEs by default, and m{i} is
-- referenced 2×MERGE_PASSES times by the nested replaces below —
-- inlining re-evaluates the whole upstream chain per reference
-- (exponential across iterations; the triangle-oracle lesson)
m{i} AS MATERIALIZED (
  SELECT s1, s2, cnt FROM p{i}
  ORDER BY cnt DESC, s1 ASC, s2 ASC LIMIT 1
),
seq{i} AS MATERIALIZED (
  -- * REPLACE keeps any carried columns (the tokenize oracle's seq0
  -- also carries `word`; the training oracle's carries only seq, n).
  -- The merge is the sentinel-padded ' l r ' -> ' lr ' replace
  -- iterated MERGE_PASSES times (see _apply_merge) — boundary-exact
  -- and fixpoint-equal to greedy BPE, unlike a bare replace.
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
  SELECT array_to_string(string_split(word, ''), ' ') AS seq, n FROM words
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
    merges = _fit_merges(spark, sf_dir)
    chars = F.filter(F.split(F.col("word"), ""), lambda c: F.length(c) > 0)
    seq = F.array_join(chars, " ")
    for s1, s2, _ in merges:
        seq = _apply_merge(seq, s1, s2)
    # ONE corpus scan: the per-doc explode is checkpointed and the
    # DISTINCT-word vocabulary derives from it (an r5 review caught
    # a second scan via _word_freqs here — and the frequency column
    # it carried was never used by the apply side)
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(ws_tokens()).alias("word"))
        .localCheckpoint(eager=False)
    )
    word_sub = d.select("word").distinct().select(
        "word", (F.size(F.split(seq, " "))).cast("long").alias("n_sub")
    )
    return (
        d.join(F.broadcast(word_sub), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("n_sub").alias("n_subwords"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_subwords",
            (
                F.col("n_subwords").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("subwords_per_token"),
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
  SELECT word, array_to_string(string_split(word, ''), ' ') AS seq, n
  FROM words
),{iters},
word_sub AS (
  SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_sub
  FROM seq{BPE_ITERS}
)
SELECT t.doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(w.n_sub) AS BIGINT) AS n_subwords,
       CAST(SUM(w.n_sub) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS subwords_per_token
FROM tok t JOIN word_sub w USING (word)
GROUP BY t.doc_id
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "bpe_merge_training": (bpe_merge_training, _bpe_sql()),
    "docs_bpe_tokenize": (docs_bpe_tokenize, _bpe_tokenize_sql()),
}
