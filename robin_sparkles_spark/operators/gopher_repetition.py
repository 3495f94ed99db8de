"""Gopher repetition-filter battery (r15 — VERDICT r14 #3; EXT).

Rae et al. 2021 §A1.2 — the REPETITION half of the Gopher filters
(the quality half §A1.1 is ``text_analysis.docs_gopher_quality_flags``;
MassiveText/FineWeb-class pipelines always run both): per document,

- duplicate LINE fraction  > 0.30  → remove   (and PARAGRAPH > 0.30)
- duplicate line CHARACTER fraction > 0.20    (paragraph > 0.20)
- top {2,3,4}-gram character fraction > {0.20, 0.18, 0.16}
- duplicate {5..10}-gram character fraction
  > {0.15, 0.14, 0.13, 0.12, 0.11, 0.10}

Exact definitions used by BOTH engines (documented because published
implementations differ in the tails):

- lines: split on ``\\n``; paragraphs: split on ``\\n\\n``; empty
  segments dropped. A duplicate element is an occurrence beyond the
  first (total − distinct — the standard counting in the open
  pipeline implementations of the Gopher filters, e.g. HuggingFace
  DataTrove's GopherRepetitionFilter), so both the element and the
  character numerators are computable MAP-ONLY from
  ``size(arr) − size(array_distinct(arr))`` — no shuffle.
- word n-grams are over the whitespace-split word stream of the whole
  text (they cross line boundaries, as in the paper); the n-gram's
  character length includes its internal single spaces, and the
  denominator is the single-space-normalized text length
  Σ len(word) + (n_words − 1).
- top n-gram coverage = count × len of the most frequent n-gram,
  ties broken toward larger coverage (deterministic in both engines
  via a (count, coverage) struct max — published code breaks ties by
  hash-map iteration order, which no two engines share).
- duplicate n-gram coverage = Σ over distinct n-grams with count ≥ 2
  of count × len — the per-occurrence approximation (overlapping
  occurrences counted per occurrence, not by character-position
  union; the positional union needs per-position state that turns a
  3-line aggregation into a segment-merge, and the approximation
  only ever OVER-counts, i.e. filters strictly more aggressively).
- every flag is an exact integer cross-multiplication
  (``100·num ≤ T·denom``) — no doubles anywhere, so the two engines
  hash identically.

Corpus: fixture documents are single-line, so — the planted-corpus
pattern (``line_dedup``, ``embedding_dedup``) — staging deterministically
re-chunks each word stream into 8-word lines / 3-line paragraphs and
plants in-document repetition: every doc_id % 3 == 0 doc repeats its
first line, every doc_id % 5 == 0 doc repeats its first paragraph.
Both engines read the SAME staged parquet, so the planting is not part
of the gated surface.

Plan shape (100 TB posture, r15 optimization — guide §2.3/§2.4, the
same per-doc-fold rewrite as the simhash/minhash signatures in
OPTIMIZATION_r15.md #10): the ENTIRE battery is per-document, so
nothing needs a shuffle. The line/paragraph stats are per-row folds;
the n-gram stats are, per n, a sorted-run fold — ``array_sort`` the
n-gram array, then one ``aggregate`` pass counts runs of equal grams
and carries (top count, top coverage, duplicate coverage) exactly as
the old ``max(struct(cnt, cov))`` / ``sum(cov where cnt ≥ 2)``
aggregation did (run-length over a sorted array ≡ COUNT(*) GROUP BY
gram; the (c, v)-lexicographic top tie rule is reproduced in the
fold's update branch). Zero exchanges, zero joins — the old shape
(flatten-explode 9 tagged streams → groupBy(doc_id, n, gram) →
groupBy(doc_id, n) → groupBy(doc_id) pivot → join back) paid three
shuffles and a join to regroup by a key every row already carried.
A/B at sf0.1 (noop sink, min of 4): n-gram stats 3.26 s → 1.12 s,
outputs row-identical (exceptAll both ways = 0).

The scan is fanned across the core budget when the staged corpus is
small (``fan_out_width_path`` — returns 0 once the input splits
naturally, so the repartition vanishes at production scale; the whole
fold otherwise fuses into a 4-task scan stage at fixture scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table
from ..sources.staging import is_staged, staged_path

REP_LINE_WORDS = 8  # staged corpus: words per synthetic line
REP_PARA_LINES = 3  # staged corpus: lines per synthetic paragraph
REP_DUP_LINE_EVERY = 3  # doc_id % 3 == 0 docs repeat their first line
REP_DUP_PARA_EVERY = 5  # doc_id % 5 == 0 docs repeat their first paragraph

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)
# thresholds as integer PERCENTS (keep iff 100·num ≤ pct·denom)
TOP_PCT = {2: 20, 3: 18, 4: 16}
DUP_PCT = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}
DUP_LINE_PCT = 30  # duplicate line/paragraph element fraction
DUP_CHAR_PCT = 20  # duplicate line/paragraph character fraction


def gopher_rep_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "gopher_rep_docs", "documents")


def build_gopher_rep_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently stage the re-chunked + repetition-planted corpus
    (deterministic per doc_id — see module docstring)."""
    path = gopher_rep_corpus_path(sf_dir)
    if is_staged(path):
        return path
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    w, p = REP_LINE_WORDS, REP_PARA_LINES
    lines = F.expr(
        "transform(sequence(1, greatest(cast(ceil(size(words) / "
        f"{w}.0) as int), 1)), i -> array_join(slice(words, (i-1)*{w}+1, {w}), ' '))"
    )
    staged = (
        docs.select(
            "doc_id",
            F.filter(F.split("text", " "), lambda t: F.length(t) > 0).alias(
                "words"
            ),
        )
        .select("doc_id", lines.alias("lines"))
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % REP_DUP_LINE_EVERY == 0,
                F.concat(F.col("lines"), F.slice("lines", 1, 1)),
            )
            .otherwise(F.col("lines"))
            .alias("lines"),
        )
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, greatest(cast(ceil(size(lines) / "
                f"{p}.0) as int), 1)), i -> "
                f"array_join(slice(lines, (i-1)*{p}+1, {p}), '\\n'))"
            ).alias("paras"),
        )
        .select(
            "doc_id",
            F.array_join(
                F.when(
                    F.col("doc_id") % REP_DUP_PARA_EVERY == 0,
                    F.concat(F.col("paras"), F.slice("paras", 1, 1)),
                ).otherwise(F.col("paras")),
                "\n\n",
            ).alias("text"),
        )
    )
    n_files = max(4, min(64, n_docs // 8192))
    staged.repartition(n_files).write.mode("overwrite").parquet(path)
    return path


def _dup_stats(arr: F.Column) -> "tuple[F.Column, F.Column, F.Column]":
    """(n, duplicates-beyond-first, duplicate chars) of a string array
    — map-only via the total − distinct identity."""
    n = F.size(arr)
    total_chars = F.aggregate(
        arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    distinct_chars = F.aggregate(
        F.array_distinct(arr), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    return n, n - F.size(F.array_distinct(arr)), total_chars - distinct_chars


def _ngram_fold_sql(n: int) -> str:
    """Zero-shuffle per-doc n-gram stats: sort the n-gram array, fold
    runs of equal grams. Returns struct(tv = top n-gram coverage with
    the (count, coverage)-lexicographic tie rule, dv = Σ count·len over
    grams with count ≥ 2) — exactly the old groupBy(doc_id, n, gram) →
    max(struct(cnt, cov)) / sum(cov WHERE cnt ≥ 2) aggregation, proven
    row-identical on the full fixture corpus (exceptAll = 0 both ways).
    Accumulator: p = current run's gram, r = its length so far,
    (tc, tv) = best (count, coverage) of CLOSED runs, dv = duplicate
    coverage of closed runs; the finish lambda closes the last run.
    Exact integers throughout (the declared no-doubles contract)."""
    grams = (
        f"array_sort(transform(sequence(1, size(words) - {n} + 1), "
        f"i -> array_join(slice(words, i, {n}), ' ')))"
    )
    upd_tc = (
        "CASE WHEN a.r > a.tc OR (a.r = a.tc AND a.r*length(a.p) > a.tv) "
        "THEN a.r ELSE a.tc END"
    )
    upd_tv = (
        "CASE WHEN a.r > a.tc OR (a.r = a.tc AND a.r*length(a.p) > a.tv) "
        "THEN a.r*length(a.p) ELSE a.tv END"
    )
    upd_dv = "a.dv + CASE WHEN a.r >= 2 THEN a.r*length(a.p) ELSE CAST(0 AS BIGINT) END"
    zero = "named_struct('tv', CAST(0 AS BIGINT), 'dv', CAST(0 AS BIGINT))"
    return (
        f"CASE WHEN size(words) >= {n} THEN aggregate({grams}, "
        "named_struct('p', CAST(NULL AS STRING), 'r', CAST(0 AS BIGINT), "
        "'tc', CAST(0 AS BIGINT), 'tv', CAST(0 AS BIGINT), 'dv', CAST(0 AS BIGINT)), "
        "(a, g) -> CASE "
        "WHEN a.p IS NULL THEN named_struct('p', g, 'r', CAST(1 AS BIGINT), "
        "'tc', a.tc, 'tv', a.tv, 'dv', a.dv) "
        "WHEN g = a.p THEN named_struct('p', a.p, 'r', a.r + CAST(1 AS BIGINT), "
        "'tc', a.tc, 'tv', a.tv, 'dv', a.dv) "
        f"ELSE named_struct('p', g, 'r', CAST(1 AS BIGINT), "
        f"'tc', {upd_tc}, 'tv', {upd_tv}, 'dv', {upd_dv}) END, "
        f"a -> CASE WHEN a.p IS NULL THEN {zero} "
        f"ELSE named_struct('tv', {upd_tv}, 'dv', {upd_dv}) END) "
        f"ELSE {zero} END"
    )


def docs_gopher_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Gopher §A1.2 repetition flags over the planted corpus
    (see module docstring for the exact numerators/denominators).
    Zero-shuffle since r15: every stat is a per-row fold."""
    from ..sources.tables import fan_out_width_path

    path = build_gopher_rep_corpus(spark, sf_dir)
    corpus = spark.read.parquet(path)
    width = fan_out_width_path(path)
    if width:
        corpus = corpus.repartition(width)
    lines_arr = F.filter(F.split("text", "\n"), lambda x: F.length(x) > 0)
    paras_arr = F.filter(F.split("text", "\n\n"), lambda x: F.length(x) > 0)
    words_arr = F.filter(F.split("text", "\\s+"), lambda x: F.length(x) > 0)
    n_lines, dup_lines, dup_line_chars = _dup_stats(lines_arr)
    n_paras, dup_paras, dup_para_chars = _dup_stats(paras_arr)
    line_chars = F.aggregate(
        lines_arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    para_chars = F.aggregate(
        paras_arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    word_chars = F.aggregate(
        words_arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    norm_chars = word_chars + F.greatest(
        F.size(words_arr) - 1, F.lit(0)
    ).cast("long")
    base = corpus.select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        dup_lines.cast("long").alias("dup_lines"),
        dup_line_chars.alias("dup_line_chars"),
        line_chars.alias("line_chars"),
        n_paras.cast("long").alias("n_paras"),
        dup_paras.cast("long").alias("dup_paras"),
        dup_para_chars.alias("dup_para_chars"),
        para_chars.alias("para_chars"),
        norm_chars.alias("norm_chars"),
        words_arr.alias("words"),
    )

    # per-doc sorted-run folds for all 9 n values — zero shuffles; the
    # short-doc case (size(words) < n: Spark's sequence() DESCENDS when
    # stop < start) is guarded inside _ngram_fold_sql, yielding the
    # same zeros the old LEFT-join + coalesce produced for absent rows
    j = base.select(
        "doc_id",
        "n_lines",
        "dup_lines",
        "dup_line_chars",
        "line_chars",
        "n_paras",
        "dup_paras",
        "dup_para_chars",
        "para_chars",
        "norm_chars",
        *[
            F.expr(_ngram_fold_sql(n)).alias(f"s{n}")
            for n in TOP_NS + DUP_NS
        ],
    )
    vals = {
        **{f"top{n}_chars": F.col(f"s{n}.tv") for n in TOP_NS},
        **{f"dup{n}_chars": F.col(f"s{n}.dv") for n in DUP_NS},
    }
    flags = {
        "dup_line_ok": 100 * F.col("dup_lines") <= DUP_LINE_PCT * F.col("n_lines"),
        "dup_para_ok": 100 * F.col("dup_paras") <= DUP_LINE_PCT * F.col("n_paras"),
        "dup_line_char_ok": 100 * F.col("dup_line_chars")
        <= DUP_CHAR_PCT * F.col("line_chars"),
        "dup_para_char_ok": 100 * F.col("dup_para_chars")
        <= DUP_CHAR_PCT * F.col("para_chars"),
        **{
            f"top{n}_ok": 100 * vals[f"top{n}_chars"]
            <= TOP_PCT[n] * F.col("norm_chars")
            for n in TOP_NS
        },
        **{
            f"dup{n}_ok": 100 * vals[f"dup{n}_chars"]
            <= DUP_PCT[n] * F.col("norm_chars")
            for n in DUP_NS
        },
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return j.select(
        "doc_id",
        "n_lines",
        "dup_lines",
        "dup_line_chars",
        "n_paras",
        "dup_paras",
        "dup_para_chars",
        "norm_chars",
        *[vals[f"top{n}_chars"].alias(f"top{n}_chars") for n in TOP_NS],
        *[vals[f"dup{n}_chars"].alias(f"dup{n}_chars") for n in DUP_NS],
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


def docs_gopher_repetition_oracle(sf_dir: str) -> str:
    """Lazy DuckDB twin over the SAME staged parquet — every
    numerator/denominator mirrored term-for-term in exact integers."""
    from ..session import active_or_local

    spark = active_or_local("gopher_rep_oracle")
    path = build_gopher_rep_corpus(spark, sf_dir)
    ns = ", ".join(str(n) for n in TOP_NS + DUP_NS)
    top_piv = ",\n       ".join(
        f"COALESCE(MAX(CASE WHEN n = {n} THEN top_cov END), 0) AS top{n}_chars"
        for n in TOP_NS
    )
    dup_piv = ",\n       ".join(
        f"COALESCE(MAX(CASE WHEN n = {n} THEN dup_cov END), 0) AS dup{n}_chars"
        for n in DUP_NS
    )
    top_flags = "\n       ".join(
        f", (100 * COALESCE(p.top{n}_chars, 0) <= {TOP_PCT[n]} * b.norm_chars) AS top{n}_ok"
        for n in TOP_NS
    )
    dup_flags = "\n       ".join(
        f", (100 * COALESCE(p.dup{n}_chars, 0) <= {DUP_PCT[n]} * b.norm_chars) AS dup{n}_ok"
        for n in DUP_NS
    )
    keep_expr = " AND ".join(
        [
            f"(100 * b.dup_lines <= {DUP_LINE_PCT} * b.n_lines)",
            f"(100 * b.dup_paras <= {DUP_LINE_PCT} * b.n_paras)",
            f"(100 * b.dup_line_chars <= {DUP_CHAR_PCT} * b.line_chars)",
            f"(100 * b.dup_para_chars <= {DUP_CHAR_PCT} * b.para_chars)",
        ]
        + [
            f"(100 * COALESCE(p.top{n}_chars, 0) <= {TOP_PCT[n]} * b.norm_chars)"
            for n in TOP_NS
        ]
        + [
            f"(100 * COALESCE(p.dup{n}_chars, 0) <= {DUP_PCT[n]} * b.norm_chars)"
            for n in DUP_NS
        ]
    )
    sum_len = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform({arr}, x -> CAST(len(x) AS BIGINT))), (a, x) -> a + x)"
    )
    return f"""
WITH raw AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), x -> len(x) > 0) AS lines,
         list_filter(string_split(text, chr(10) || chr(10)), x -> len(x) > 0) AS paras,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS words
  FROM read_parquet('{path}/*.parquet')
),
b AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(lines) - len(list_distinct(lines)) AS BIGINT) AS dup_lines,
         {sum_len.format(arr='lines')} - {sum_len.format(arr='list_distinct(lines)')} AS dup_line_chars,
         {sum_len.format(arr='lines')} AS line_chars,
         CAST(len(paras) AS BIGINT) AS n_paras,
         CAST(len(paras) - len(list_distinct(paras)) AS BIGINT) AS dup_paras,
         {sum_len.format(arr='paras')} - {sum_len.format(arr='list_distinct(paras)')} AS dup_para_chars,
         {sum_len.format(arr='paras')} AS para_chars,
         {sum_len.format(arr='words')} + GREATEST(len(words) - 1, 0) AS norm_chars,
         words
  FROM raw
),
ex AS (
  SELECT doc_id, n, array_to_string(list_slice(words, i, i + n - 1), ' ') AS g
  FROM (
    SELECT doc_id, n, words,
           unnest(generate_series(1, len(words) - n + 1)) AS i
    FROM b CROSS JOIN (SELECT unnest([{ns}]) AS n) ns
  )
),
grp AS (
  SELECT doc_id, n, g, COUNT(*) AS cnt FROM ex GROUP BY doc_id, n, g
),
per_n AS (
  SELECT doc_id, n,
         (MAX({{'c': cnt, 'v': cnt * CAST(len(g) AS BIGINT)}})).v AS top_cov,
         CAST(SUM(CASE WHEN cnt >= 2 THEN cnt * CAST(len(g) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS dup_cov
  FROM grp GROUP BY doc_id, n
),
piv AS (
  SELECT doc_id,
       {top_piv},
       {dup_piv}
  FROM per_n GROUP BY doc_id
)
SELECT b.doc_id, b.n_lines, b.dup_lines, b.dup_line_chars,
       b.n_paras, b.dup_paras, b.dup_para_chars, b.norm_chars,
       {", ".join(f"COALESCE(p.top{n}_chars, 0) AS top{n}_chars" for n in TOP_NS)},
       {", ".join(f"COALESCE(p.dup{n}_chars, 0) AS dup{n}_chars" for n in DUP_NS)},
       (100 * b.dup_lines <= {DUP_LINE_PCT} * b.n_lines) AS dup_line_ok,
       (100 * b.dup_paras <= {DUP_LINE_PCT} * b.n_paras) AS dup_para_ok,
       (100 * b.dup_line_chars <= {DUP_CHAR_PCT} * b.line_chars) AS dup_line_char_ok,
       (100 * b.dup_para_chars <= {DUP_CHAR_PCT} * b.para_chars) AS dup_para_char_ok
       {top_flags}
       {dup_flags},
       ({keep_expr}) AS keep
FROM b LEFT JOIN piv p USING (doc_id)
"""


QUERIES = {
    "docs_gopher_repetition_flags": (
        docs_gopher_repetition_flags,
        docs_gopher_repetition_oracle,
    ),
}
