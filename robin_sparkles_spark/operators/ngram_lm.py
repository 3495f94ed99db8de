"""N-gram language-model operators over the documents corpus (EXT —
LLM-data-pipeline family; SURVEY.md §2 additions beyond the
reference's WordCount-era text surface, `reference/src/main/scala/
com/highperformancespark/robinsparkles/WordCount.scala:19-25`):

* ``ngram_lm_score`` — train an add-one-smoothed bigram LM on a
  reference slice of the corpus and score EVERY document with
  fixed-point integer statistics. This is the perplexity-filter
  shape (CCNet / Gopher "quality by LM score") re-expressed without
  transcendental functions: the gate hashes values bit-for-bit, and
  libm ``ln`` is not guaranteed identical across engines, so scores
  are exact integer fixed-point probabilities, not log-probs. Rank
  order is preserved (monotone transform), which is all a quality
  filter consumes.

* ``ngram_repeated_spans`` — the memorization / boilerplate audit:
  the most-repeated K-token spans across the corpus with occurrence
  and distinct-document counts (the statistic behind exact-substring
  dedup, Lee et al. 2022 "Deduplicating Training Data Makes Language
  Models Better" — the top of this table is what that pipeline
  removes).

Scale notes (100 TB):
- Training counts are vocabulary-bound aggregates (|V| and |V|²-cap
  rows), shuffled once on their keys; the corpus is scanned
  column-pruned (``text`` only) and never re-materialized.
- Scoring is two equi-joins (doc bigrams ⋈ bigram counts on
  (w1,w2), ⋈ prefix counts on w1) followed by a per-doc aggregate —
  every stage is key-partitioned, nothing is quadratic. On a real
  cluster the prefix-count side is broadcastable (|V| rows).
- Fixed-point arithmetic is DECIMAL-widened before the multiply so
  the idiom survives corpus-scale counts (a bigram seen 10⁹ times
  times the 10¹² scale overflows int64; decimal(38) does not).
- The span audit is an explode(×K) → groupBy(ngram) → top-k; the
  global order-by-limit compiles to TakeOrderedAndProject
  (per-partition heads + driver merge of k rows), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table

# Fixed-point scale for probabilities: p_fp = floor(p * 10^12).
PROB_SCALE = 10**12
# The LM trains on this slice of the corpus and scores everything —
# the "reference-corpus perplexity filter" shape.
TRAIN_SOURCES = ("src0", "src1", "src2")
_TRAIN_SQL = ", ".join(f"'{s}'" for s in TRAIN_SOURCES)

SPAN_K = 8  # tokens per repeated-span n-gram
SPAN_TOP = 50  # rows returned by the audit


def _lc_tokens(col: str = "text") -> F.Column:
    """Lower-cased whitespace tokens (the LM casefolds; the shared
    ws_tokens helper deliberately does not)."""
    return F.filter(F.split(F.lower(F.col(col)), " "), lambda t: F.length(t) > 0)


_LC_TOKS_SQL = "list_filter(string_split(lower(text), ' '), t -> len(t) > 0)"


def _bigrams(ws_col: str = "ws") -> F.Column:
    """Adjacent-pair structs from a token array (empty when <2)."""
    return F.expr(
        f"if(size({ws_col}) >= 2,"
        f"   transform(sequence(0, size({ws_col}) - 2),"
        f"             i -> struct({ws_col}[i] AS w1, {ws_col}[i+1] AS w2)),"
        "   array())"
    )


def ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document add-one bigram-LM statistics, exact fixed-point.

    Model (trained on ``source IN TRAIN_SOURCES``):
        P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)
    with c(w1·) the prefix count (Σ_w2 c(w1,w2)) and V = distinct
    train token types + 1 (the +1 is the OOV type).

    Per doc (ALL sources, train included):
        n_bigrams     — scored bigram count
        oov_bigrams   — bigrams never seen in training
        sum_prob_fp   — Σ floor(P · 10¹²)  (exact integer)
        min_prob_fp   — min floor(P · 10¹²), NULL for <2-token docs
    Lower sum/min and higher oov = further from the reference slice —
    the filter ranks on these exactly as it would on mean log-prob.
    """
    d = load_table(spark, sf_dir, "documents")
    train = d.where(F.col("source").isin(*TRAIN_SOURCES))

    # vocabulary-bound training aggregates (one shuffle each)
    tr_ws = train.select(_lc_tokens().alias("ws"))
    bg_counts = (
        tr_ws.select(F.explode(_bigrams()).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    prefix_counts = bg_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab_v = tr_ws.select(F.explode("ws").alias("t")).agg(
        (F.count_distinct("t") + F.lit(1)).alias("v")
    )

    doc_bg = (
        d.select("doc_id", _lc_tokens().alias("ws"))
        .select("doc_id", F.explode(_bigrams()).alias("bg"))
        .select("doc_id", "bg.w1", "bg.w2")
    )
    scored = (
        doc_bg.join(bg_counts, ["w1", "w2"], "left")
        .join(prefix_counts, ["w1"], "left")
        .crossJoin(F.broadcast(vocab_v))  # 1-row scalar (sanctioned shape)
        .withColumn("c12", F.coalesce(F.col("c12"), F.lit(0)))
        .withColumn("c1", F.coalesce(F.col("c1"), F.lit(0)))
        # decimal-widened fixed point: floor(((c12+1)·SCALE)/(c1+V))
        .withColumn(
            "p_fp",
            F.expr(
                f"CAST((CAST(c12 + 1 AS DECIMAL(20,0)) * {PROB_SCALE})"
                f"     div CAST(c1 + v AS DECIMAL(20,0)) AS BIGINT)"
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum((F.col("c12") == 0).cast("long")).alias("oov_bigrams"),
        F.sum("p_fp").alias("sum_prob_fp"),
        F.min("p_fp").alias("min_prob_fp"),
    )
    return (
        d.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("source"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("oov_bigrams", F.lit(0)).alias("oov_bigrams"),
            F.coalesce("sum_prob_fp", F.lit(0)).alias("sum_prob_fp"),
            F.col("min_prob_fp"),
        )
    )


NGRAM_LM_SCORE_SQL = f"""
WITH tr_ws AS (
  SELECT {_LC_TOKS_SQL} AS ws FROM documents WHERE source IN ({_TRAIN_SQL})
),
tr_bg AS (
  SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS bg
  FROM tr_ws WHERE len(ws) >= 2
),
bgc AS (SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS c12 FROM tr_bg GROUP BY 1, 2),
pfx AS (SELECT w1, SUM(c12) AS c1 FROM bgc GROUP BY 1),
voc AS (
  SELECT COUNT(DISTINCT t) + 1 AS v
  FROM (SELECT unnest(ws) AS t FROM tr_ws)
),
doc_bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - 1),
                i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS bg
  FROM (SELECT doc_id, {_LC_TOKS_SQL} AS ws FROM documents)
  WHERE len(ws) >= 2
),
scored AS (
  SELECT doc_id,
         COALESCE(c12, 0) AS c12,
         CAST((CAST(COALESCE(c12, 0) + 1 AS HUGEINT) * {PROB_SCALE})
              // CAST(COALESCE(c1, 0) + v AS HUGEINT) AS BIGINT) AS p_fp
  FROM doc_bg
  LEFT JOIN bgc ON doc_bg.bg.w1 = bgc.w1 AND doc_bg.bg.w2 = bgc.w2
  LEFT JOIN pfx ON doc_bg.bg.w1 = pfx.w1
  CROSS JOIN voc
),
per_doc AS (
  SELECT doc_id,
         COUNT(*) AS n_bigrams,
         SUM(CASE WHEN c12 = 0 THEN 1 ELSE 0 END) AS oov_bigrams,
         SUM(p_fp) AS sum_prob_fp,
         MIN(p_fp) AS min_prob_fp
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id, d.source,
       CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(oov_bigrams, 0) AS BIGINT) AS oov_bigrams,
       CAST(COALESCE(sum_prob_fp, 0) AS BIGINT) AS sum_prob_fp,
       CAST(min_prob_fp AS BIGINT) AS min_prob_fp
FROM documents d LEFT JOIN per_doc USING (doc_id)
"""


def ngram_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{SPAN_TOP} most-repeated {SPAN_K}-token spans with
    occurrence and distinct-doc counts — the memorization audit.
    Ties broken by span text for a total order."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _lc_tokens().alias("ws")).where(
        F.size("ws") >= SPAN_K
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(ws) - {SPAN_K}),"
                f"          i -> array_join(slice(ws, i + 1, {SPAN_K}), ' '))"
            )
        ).alias("ngram"),
    )
    agg = spans.groupBy("ngram").agg(
        F.count("*").alias("occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    return agg.orderBy(
        F.desc("occurrences"), F.asc("ngram")
    ).limit(SPAN_TOP)


NGRAM_REPEATED_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_LC_TOKS_SQL} AS ws FROM documents
),
spans AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - {SPAN_K - 1}),
                i -> list_aggregate(ws[i:i + {SPAN_K - 1}], 'string_agg', ' '))) AS ngram
  FROM toks WHERE len(ws) >= {SPAN_K}
)
SELECT ngram, COUNT(*) AS occurrences, COUNT(DISTINCT doc_id) AS n_docs
FROM spans
GROUP BY ngram
ORDER BY occurrences DESC, ngram ASC
LIMIT {SPAN_TOP}
"""


QUERIES = {
    "ngram_lm_score": (ngram_lm_score, NGRAM_LM_SCORE_SQL),
    "ngram_repeated_spans": (ngram_repeated_spans, NGRAM_REPEATED_SPANS_SQL),
}
