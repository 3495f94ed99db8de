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

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.barrier import barrier
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

    # vocabulary-bound training aggregates (one shuffle each).
    # r15 (guide §2.4): the bigram count table is consumed TWICE —
    # the scoring join and the prefix-count derivation — and without
    # a barrier each consumer replays the full train tokenize +
    # explode + shuffle (runtime-checked: zero ReusedExchange). The
    # vocab-class barrier materializes it once; prefix counts then
    # aggregate the materialized table. Outputs row-identical
    # (exceptAll = 0 both ways), one fewer full train-corpus pass.
    # Scale caveat (ADVICE r15): distinct BIGRAM types grow far
    # faster than unigram vocabulary on web-scale corpora (heaps-law
    # exponent near 1 for bigrams), so the vocab bound's "plateaus,
    # executor-local fine" contract is weakest here — if bigram
    # tables prove large at the 100 TB posture, move this site to the
    # 'groups' bound or the SPARK_GRAFT_BARRIER_DIR parquet staging
    # path.
    tr_ws = train.select(_lc_tokens().alias("ws"))
    bg_counts = barrier(
        tr_ws.select(F.explode(_bigrams()).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12")),
        "vocab",
        "bigram-LM count table",
        eager=False,
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


# --- Stupid Backoff trigram scoring (r9) ------------------------------------
#
# Brants et al. 2007 ("Large Language Models in Machine Translation")
# — the scoring scheme DESIGNED for MapReduce-scale corpora: no
# normalization, no discounting fit, just count ratios with a fixed
# 0.4 backoff factor. Perfectly suited to the engine's no-libm
# contract: every score is a ratio of exact counts times a rational
# constant, so the fixed-point integer idiom applies end to end.
#   S(w3|w1,w2) = c(w123)/c(w12)           if c(w123) > 0
#               = 0.4 · c(w23)/c(w2)       elif c(w23) > 0
#               = 0.16 · c(w3)/N           otherwise
# In fixed point: (c·SCALE) div d, (2·c·SCALE) div (5·d), and
# (4·c·SCALE) div (25·N) — all exact integer arithmetic (0.4 = 2/5).

BACKOFF_SCALE = 10**12


def _trigrams(ws_col: str = "ws") -> F.Column:
    return F.expr(
        f"if(size({ws_col}) >= 3,"
        f"   transform(sequence(0, size({ws_col}) - 3),"
        f"             i -> struct({ws_col}[i] AS w1, {ws_col}[i+1] AS w2,"
        f"                         {ws_col}[i+2] AS w3)),"
        "   array())"
    )


def ngram_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Stupid Backoff trigram statistics, exact fixed
    point: trained on ``TRAIN_SOURCES``, scoring every document.
    n_trigrams / hits3 (trigram found) / hits2 (bigram backoff) /
    sum_score_fp / min_score_fp — the three-tier hit counts expose
    WHERE the mass comes from, the scores rank as log-score would.

    Plan: three vocabulary-bound count aggregates (one train-slice
    scan each — at 100 TB you'd derive lower orders from the trigram
    counts in one pass; kept separate here for plan clarity), then
    five equi-joins from the doc trigrams onto count tables keyed by
    (w1,w2,w3)/(w1,w2)/(w2,w3)/(w2)/(w3) + the 1-row N scalar, and a
    per-doc aggregate. Everything is key-partitioned; the unigram and
    bigram sides are broadcastable."""
    d = load_table(spark, sf_dir, "documents")
    train = d.where(F.col("source").isin(*TRAIN_SOURCES))
    tr_ws = train.select(_lc_tokens().alias("ws"))

    c3 = (
        tr_ws.select(F.explode(_trigrams()).alias("g"))
        .groupBy(
            F.col("g.w1").alias("w1"),
            F.col("g.w2").alias("w2"),
            F.col("g.w3").alias("w3"),
        )
        .agg(F.count("*").alias("c3"))
    )
    # r15 (guide §2.4): c2 and c1 are each consumed by TWO scoring
    # joins ((w1,w2)+(w2,w3) / (w2)+(w3)); without barriers each join
    # side replays its train tokenize + explode + count (runtime
    # check: 8 parquet scans, zero ReusedExchange). Vocab-class
    # barriers materialize each once — train passes 6 → 4, outputs
    # row-identical.
    c2 = barrier(
        tr_ws.select(F.explode(_bigrams()).alias("bg"))
        .groupBy(F.col("bg.w1").alias("b1"), F.col("bg.w2").alias("b2"))
        .agg(F.count("*").alias("c2")),
        "vocab",
        "backoff bigram count table",
        eager=False,
    )
    c1 = barrier(
        tr_ws.select(F.explode("ws").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c1")),
        "vocab",
        "backoff unigram count table",
        eager=False,
    )
    # Guard the unigram-tier denominator: an empty TRAIN_SOURCES slice
    # would otherwise yield NULL scores on Spark (decimal div 0) but a
    # hard error in the DuckDB oracle — a confusing divergence. Raise
    # loudly and identically on BOTH engines instead (the oracle twin
    # carries the same CASE/error() guard).
    n_tok = (
        tr_ws.select(F.explode("ws").alias("t"))
        .agg(F.count("*").alias("n_tok"))
        .select(
            F.expr(
                "CASE WHEN n_tok > 0 THEN n_tok ELSE raise_error("
                "'ngram_backoff_score: TRAIN_SOURCES slice is empty') END"
            ).alias("n_tok")
        )
    )

    doc_g = (
        d.select("doc_id", _lc_tokens().alias("ws"))
        .select("doc_id", F.explode(_trigrams()).alias("g"))
        .select("doc_id", "g.w1", "g.w2", "g.w3")
    )
    # DECIMAL(24,0): counts ≤ 1e9 at 100 TB; 24 + 13 (SCALE) + 1 = 38
    # keeps Spark's decimal-multiply result inside DECIMAL(38) with no
    # precision loss (38,0 operands would push the product past the
    # cap and overflow-null)
    dec = "DECIMAL(24,0)"
    scored = (
        doc_g.join(c3, ["w1", "w2", "w3"], "left")
        .join(
            c2.select(
                F.col("b1").alias("w1"),
                F.col("b2").alias("w2"),
                F.col("c2").alias("c2_hist"),
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            c2.select(
                F.col("b1").alias("w2"),
                F.col("b2").alias("w3"),
                F.col("c2").alias("c2_back"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            c1.select(F.col("t").alias("w2"), F.col("c1").alias("c1_w2")),
            ["w2"],
            "left",
        )
        .join(
            c1.select(F.col("t").alias("w3"), F.col("c1").alias("c1_w3")),
            ["w3"],
            "left",
        )
        .crossJoin(F.broadcast(n_tok))  # 1-row scalar (sanctioned shape)
        .withColumns(
            {
                "c3": F.coalesce("c3", F.lit(0)),
                "c2_hist": F.coalesce("c2_hist", F.lit(0)),
                "c2_back": F.coalesce("c2_back", F.lit(0)),
                "c1_w2": F.coalesce("c1_w2", F.lit(0)),
                "c1_w3": F.coalesce("c1_w3", F.lit(0)),
            }
        )
        .withColumn(
            "s_fp",
            F.expr(
                f"""CASE
                  WHEN c3 > 0 THEN CAST((CAST(c3 AS {dec}) * {BACKOFF_SCALE})
                       div CAST(c2_hist AS {dec}) AS BIGINT)
                  WHEN c2_back > 0 THEN CAST((CAST(2 * c2_back AS {dec}) * {BACKOFF_SCALE})
                       div CAST(5 * c1_w2 AS {dec}) AS BIGINT)
                  ELSE CAST((CAST(4 * c1_w3 AS {dec}) * {BACKOFF_SCALE})
                       div CAST(25 * n_tok AS {dec}) AS BIGINT)
                END"""
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_trigrams"),
        F.sum((F.col("c3") > 0).cast("long")).alias("hits3"),
        F.sum(
            ((F.col("c3") == 0) & (F.col("c2_back") > 0)).cast("long")
        ).alias("hits2"),
        F.sum("s_fp").alias("sum_score_fp"),
        F.min("s_fp").alias("min_score_fp"),
    )
    return (
        d.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            F.coalesce("hits3", F.lit(0)).alias("hits3"),
            F.coalesce("hits2", F.lit(0)).alias("hits2"),
            F.coalesce("sum_score_fp", F.lit(0)).alias("sum_score_fp"),
            F.col("min_score_fp"),
        )
    )


_TRIGRAM_DUCK = """unnest(list_transform(generate_series(1, len(ws) - 2),
                i -> struct_pack(w1 := ws[i], w2 := ws[i+1], w3 := ws[i+2])))"""

NGRAM_BACKOFF_SQL = f"""
WITH tr_ws AS MATERIALIZED (
  SELECT {_LC_TOKS_SQL} AS ws FROM documents WHERE source IN ({_TRAIN_SQL})
),
c3 AS MATERIALIZED (
  SELECT g.w1 AS w1, g.w2 AS w2, g.w3 AS w3, COUNT(*) AS c3
  FROM (SELECT {_TRIGRAM_DUCK} AS g FROM tr_ws WHERE len(ws) >= 3)
  GROUP BY 1, 2, 3
),
c2 AS MATERIALIZED (
  SELECT bg.w1 AS b1, bg.w2 AS b2, COUNT(*) AS c2
  FROM (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
               i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS bg
        FROM tr_ws WHERE len(ws) >= 2)
  GROUP BY 1, 2
),
c1 AS MATERIALIZED (
  SELECT t, COUNT(*) AS c1
  FROM (SELECT unnest(ws) AS t FROM tr_ws) GROUP BY t
),
ntok AS (SELECT CASE WHEN COUNT(*) > 0 THEN COUNT(*)
                     ELSE error('ngram_backoff_score: TRAIN_SOURCES slice is empty')
                END AS n_tok
         FROM (SELECT unnest(ws) AS t FROM tr_ws)),
doc_g AS MATERIALIZED (
  SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3
  FROM (SELECT doc_id, {_TRIGRAM_DUCK} AS g
        FROM (SELECT doc_id, {_LC_TOKS_SQL} AS ws FROM documents)
        WHERE len(ws) >= 3)
),
joined AS (
  SELECT doc_id,
         COALESCE(c3.c3, 0) AS c3,
         COALESCE(h.c2, 0) AS c2_hist,
         COALESCE(bk.c2, 0) AS c2_back,
         COALESCE(u2.c1, 0) AS c1_w2,
         COALESCE(u3.c1, 0) AS c1_w3,
         n_tok
  FROM doc_g
  LEFT JOIN c3 ON doc_g.w1 = c3.w1 AND doc_g.w2 = c3.w2 AND doc_g.w3 = c3.w3
  LEFT JOIN c2 h ON doc_g.w1 = h.b1 AND doc_g.w2 = h.b2
  LEFT JOIN c2 bk ON doc_g.w2 = bk.b1 AND doc_g.w3 = bk.b2
  LEFT JOIN c1 u2 ON doc_g.w2 = u2.t
  LEFT JOIN c1 u3 ON doc_g.w3 = u3.t
  CROSS JOIN ntok
),
scored2 AS (
  SELECT doc_id, c3, c2_back,
         CASE
           WHEN c3 > 0 THEN CAST((CAST(c3 AS HUGEINT) * {BACKOFF_SCALE})
                // CAST(c2_hist AS HUGEINT) AS BIGINT)
           WHEN c2_back > 0 THEN CAST((CAST(2 * c2_back AS HUGEINT) * {BACKOFF_SCALE})
                // CAST(5 * c1_w2 AS HUGEINT) AS BIGINT)
           ELSE CAST((CAST(4 * c1_w3 AS HUGEINT) * {BACKOFF_SCALE})
                // CAST(25 * n_tok AS HUGEINT) AS BIGINT)
         END AS s_fp
  FROM joined
),
per_doc AS (
  SELECT doc_id,
         COUNT(*) AS n_trigrams,
         SUM(CASE WHEN c3 > 0 THEN 1 ELSE 0 END) AS hits3,
         SUM(CASE WHEN c3 = 0 AND c2_back > 0 THEN 1 ELSE 0 END) AS hits2,
         SUM(s_fp) AS sum_score_fp,
         MIN(s_fp) AS min_score_fp
  FROM scored2 GROUP BY doc_id
)
SELECT d.doc_id, d.source,
       CAST(COALESCE(n_trigrams, 0) AS BIGINT) AS n_trigrams,
       CAST(COALESCE(hits3, 0) AS BIGINT) AS hits3,
       CAST(COALESCE(hits2, 0) AS BIGINT) AS hits2,
       CAST(COALESCE(sum_score_fp, 0) AS BIGINT) AS sum_score_fp,
       CAST(min_score_fp AS BIGINT) AS min_score_fp
FROM documents d LEFT JOIN per_doc USING (doc_id)
"""


# --- maximal repeated spans (r10 — the suffix-chain half) --------------------
#
# Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
# Better") deduplicate EXACT SUBSTRINGS of length ≥ L occurring twice
# anywhere in the corpus — their reference implementation is a suffix
# array. The distributed shape of the same audit is the K-gram CHAIN:
# any repeated substring of ≥ K tokens has every one of its K-token
# windows corpus-repeated, so maximal runs of consecutive repeated
# windows within a document are a SUPERSET of the true maximal
# repeated substrings (two adjacent windows may repeat at different
# far-away sites — the standard relaxation; exactness returns as K
# grows). The fixed-K audit above reports the top grams; this one
# reports WHERE the memorized spans live and HOW LONG they run —
# the actionable half (what to cut from a document).
#
# Scale note (written before the code, per the build contract): one
# vocabulary-keyed count aggregate + one equi-join back (AQE
# skew-splittable, unlike a window over the gram key, which would pin
# each boilerplate gram to one task), then a per-DOCUMENT window
# (bounded partitions — positions per doc, corpus-independent) and a
# per-(doc, run) aggregate. Everything is linear in corpus tokens;
# the only quadratic-shaped object, the repeated-gram multiplicity,
# is never materialized (counts, not pairs). Grams shuffle as 60-bit
# md5-fold hashes, not strings (same portable-hash contract as the
# dedup shingles; a collision can only extend a span — both engines
# hash identically so the gate is exact).

MIN_SPAN_WINDOWS = 3  # ≥ K+2 tokens: chains only, not isolated grams


def ngram_maximal_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal repeated spans per document: maximal runs of
    consecutive positions whose {SPAN_K}-token window occurs ≥ 2
    times corpus-wide; one row per span of ≥ MIN_SPAN_WINDOWS chained
    windows — (doc_id, start_pos, span_tokens, n_windows,
    max_window_occ)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _lc_tokens().alias("ws")).where(
        F.size("ws") >= SPAN_K
    )
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(ws) - {SPAN_K}),"
                f"          i -> CAST(conv(substring(md5("
                f"array_join(slice(ws, i + 1, {SPAN_K}), ' ')"
                f"), 1, 15), 16, 10) AS BIGINT))"
            )
        ).alias("pos", "g"),
    )
    # r15 (guide §2.4): one materialized gram-position table serves
    # the occurrence aggregate AND the join-back side — without it
    # both replay scan+tokenize+md5-per-window (the expensive stage).
    grams = barrier(
        grams, "corpus", "repeated-span gram positions", eager=False
    )
    occ = grams.groupBy("g").agg(F.count("*").alias("occ"))
    rep = grams.join(
        occ.where(F.col("occ") >= 2).hint("shuffle_hash"), "g"
    )
    w_d = W.partitionBy("doc_id").orderBy("pos")
    runs = rep.withColumn("run0", F.col("pos") - F.row_number().over(w_d))
    return (
        runs.groupBy("doc_id", "run0")
        .agg(
            F.min("pos").cast("long").alias("start_pos"),
            (F.max("pos") - F.min("pos") + F.lit(SPAN_K))
            .cast("long")
            .alias("span_tokens"),
            F.count("*").alias("n_windows"),
            F.max("occ").alias("max_window_occ"),
        )
        .where(F.col("n_windows") >= MIN_SPAN_WINDOWS)
        .select(
            "doc_id", "start_pos", "span_tokens", "n_windows", "max_window_occ"
        )
    )


NGRAM_MAXIMAL_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_LC_TOKS_SQL} AS ws FROM documents
),
grams AS (
  SELECT doc_id,
         i - 1 AS pos,
         CAST(concat('0x', substr(md5(list_aggregate(ws[i:i + {SPAN_K - 1}],
                                                     'string_agg', ' ')),
                     1, 15)) AS BIGINT) AS g
  FROM toks, unnest(generate_series(1, len(ws) - {SPAN_K - 1})) AS u(i)
  WHERE len(ws) >= {SPAN_K}
),
occ AS (SELECT g, COUNT(*) AS occ FROM grams GROUP BY g),
rep AS (
  SELECT grams.doc_id, grams.pos, occ.occ
  FROM grams JOIN occ USING (g) WHERE occ.occ >= 2
),
runs AS (
  SELECT doc_id, pos, occ,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS run0
  FROM rep
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS start_pos,
       CAST(MAX(pos) - MIN(pos) + {SPAN_K} AS BIGINT) AS span_tokens,
       COUNT(*) AS n_windows,
       MAX(occ) AS max_window_occ
FROM runs
GROUP BY doc_id, run0
HAVING COUNT(*) >= {MIN_SPAN_WINDOWS}
"""


# --- repeated-span REMOVAL (r11 — the surgery half) --------------------------
#
# ngram_maximal_spans (above) reports WHERE the corpus-repeated spans
# live; this operator executes Lee et al.'s actual intervention: CUT
# them from the text, keeping one occurrence corpus-wide. Policy
# (deterministic, oracle-mirrored):
# - a repeated K-window position is REMOVABLE unless it is the
#   corpus-FIRST occurrence of its gram (min over the encoded key
#   doc_id·10⁶ + pos — one extra min() inside the existing occ
#   aggregate, no window over the gram key, same skew rationale as
#   the detector);
# - removable positions re-chain into runs (the detector's
#   row_number trick) and only runs of ≥ MIN_SPAN_WINDOWS windows
#   cut (isolated repeated windows are n-gram noise, not memorized
#   spans — consistent with the declared detector);
# - a qualifying run [p_min..p_max] covers tokens
#   p_min .. p_max+K−1; the cleaned document drops every covered
#   token index (pure Catalyst array surgery: filter over
#   sequence(0, n−1) with an exists() over the doc's tiny run list,
#   then transform + array_join — no Python).
#
# Scale: one aggregate + one equi-join over gram hashes (identical to
# the detector), a per-DOC window, a per-doc collect of a few run
# structs, and a map-side array rewrite. Linear in corpus tokens.

_POS_ENC = 1_000_000  # corpus-first key = doc_id·1e6 + pos; docs are
# length-capped (n_chars ≤ 2000 ⇒ pos ≪ 1e6), asserted in the token cap


def docs_scrub_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document with its corpus-repeated spans (runs of ≥
    {MIN_SPAN_WINDOWS} chained {SPAN_K}-token windows, keep-first
    policy) cut out: (doc_id, n_tokens, n_removed, cleaned_text)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _lc_tokens().alias("ws"))
    grams = toks.where(F.size("ws") >= SPAN_K).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(ws) - {SPAN_K}),"
                f"          i -> CAST(conv(substring(md5("
                f"array_join(slice(ws, i + 1, {SPAN_K}), ' ')"
                f"), 1, 15), 16, 10) AS BIGINT))"
            )
        ).alias("pos", "g"),
    )
    grams = barrier(  # r15: same reuse contract as ngram_maximal_spans
        grams, "corpus", "repeated-span gram positions", eager=False
    )
    occ = grams.groupBy("g").agg(
        F.count("*").alias("occ"),
        F.min(F.col("doc_id") * _POS_ENC + F.col("pos")).alias("first_key"),
    )
    removable = (
        grams.join(occ.where(F.col("occ") >= 2).hint("shuffle_hash"), "g")
        .where(F.col("doc_id") * _POS_ENC + F.col("pos") != F.col("first_key"))
    )
    w_d = W.partitionBy("doc_id").orderBy("pos")
    runs = (
        removable.withColumn(
            "run0", F.col("pos") - F.row_number().over(w_d)
        )
        .groupBy("doc_id", "run0")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + F.lit(SPAN_K - 1)).alias("e"),
            F.count("*").alias("n_w"),
        )
        .where(F.col("n_w") >= MIN_SPAN_WINDOWS)
    )
    cover = runs.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("cuts")
    )
    return (
        toks.join(cover, "doc_id", "left")
        .withColumn(
            "kept",
            F.expr(
                "transform("
                "  filter(sequence(0, size(ws) - 1),"
                "         i -> cuts IS NULL OR"
                "              NOT exists(cuts, r -> i >= r.s AND i <= r.e)),"
                "  i -> element_at(ws, i + 1))"
            ),
        )
        .select(
            "doc_id",
            F.size("ws").cast("long").alias("n_tokens"),
            (F.size("ws") - F.size("kept")).cast("long").alias("n_removed"),
            F.array_join("kept", " ").alias("cleaned_text"),
        )
    )


DOCS_SCRUB_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_LC_TOKS_SQL} AS ws FROM documents
),
grams AS (
  SELECT doc_id,
         i - 1 AS pos,
         CAST(concat('0x', substr(md5(list_aggregate(ws[i:i + {SPAN_K - 1}],
                                                     'string_agg', ' ')),
                     1, 15)) AS BIGINT) AS g
  FROM toks, unnest(generate_series(1, len(ws) - {SPAN_K - 1})) AS u(i)
  WHERE len(ws) >= {SPAN_K}
),
occ AS (
  SELECT g, COUNT(*) AS occ,
         MIN(doc_id * {_POS_ENC} + pos) AS first_key
  FROM grams GROUP BY g
),
removable AS (
  SELECT grams.doc_id, grams.pos
  FROM grams JOIN occ USING (g)
  WHERE occ.occ >= 2
    AND grams.doc_id * {_POS_ENC} + grams.pos <> occ.first_key
),
runs AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS run0
  FROM removable
),
cuts AS (
  SELECT doc_id,
         MIN(pos) AS s,
         MAX(pos) + {SPAN_K - 1} AS e
  FROM runs GROUP BY doc_id, run0
  HAVING COUNT(*) >= {MIN_SPAN_WINDOWS}
),
cover AS (
  SELECT doc_id, LIST(struct_pack(s := s, e := e)) AS cuts
  FROM cuts GROUP BY doc_id
),
cleaned AS (
  SELECT t.doc_id, t.ws,
         list_transform(
           list_filter(generate_series(0, len(t.ws) - 1),
                       i -> c.cuts IS NULL OR
                            len(list_filter(c.cuts,
                                            r -> i >= r.s AND i <= r.e)) = 0),
           i -> t.ws[i + 1]) AS kept
  FROM toks t LEFT JOIN cover c USING (doc_id)
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
       -- DuckDB's array_to_string returns NULL for the empty list a
       -- fully-scrubbed doc leaves; Spark's array_join returns ''
       COALESCE(array_to_string(kept, ' '), '') AS cleaned_text
FROM cleaned
"""


# --- CCNet-style perplexity bucketing (r15, EXT) -----------------------------
#
# CCNet (Wenzek et al. 2020 §4.3) — the pipeline behind most public
# crawl corpora — buckets documents per LANGUAGE into head/middle/tail
# by LM perplexity terciles computed on a REFERENCE corpus (Wikipedia
# there), then trains on head(+middle). The declared twin: the
# existing exact fixed-point bigram LM supplies the score (mean
# per-bigram probability — monotone inverse of perplexity, so tercile
# splits are identical), the reference slice is the deterministic
# doc_id % CCNET_REF_MOD == 0 sample (the fixture's Wikipedia
# stand-in), and the per-language cutoffs are the ⌈n/3⌉-th and
# ⌈2n/3⌉-th smallest reference scores.
#
# Scale shape: scoring is the LM family's vocab-bound aggregates +
# per-doc groupBy; the cutoff stage aggregates ONLY the reference
# slice — in production that is a FIXED reference corpus, so the
# per-language sorted array is reference-bounded, not corpus-bounded.
# Because the fixture stand-in is corpus-proportional (20%), the
# declared plan carries the sampled-fit law (VERDICT r13 #3 pattern):
# above CCNET_REF_CAP reference docs the slice is hash-thinned to the
# cap (dispatch never reached at gate SFs — identity below the cap;
# the subsample arm is pinned by its own pytest). Bucketing the full
# corpus is then a broadcast join on lang (≤ |languages| rows) + a
# map-side CASE — zero windows, no lang-keyed shuffle of the corpus.
CCNET_REF_MOD = 5  # doc_id % 5 == 0 is the reference slice
CCNET_REF_CAP = 100_000  # max reference docs entering the cutoff sort
_CCNET_REF_N_CACHE: dict[str, int] = {}


def _ccnet_ref_count(spark: SparkSession, sf_dir: str) -> int:
    from ..sources.staging import source_fingerprint

    key = source_fingerprint(sf_dir, "documents")
    n = _CCNET_REF_N_CACHE.get(key)
    if n is None:
        n = (
            load_table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % CCNET_REF_MOD == 0)
            .count()
        )
        _CCNET_REF_N_CACHE[key] = n
    return n


def _ccnet_thin_permille(ref_n: int) -> int:
    """Per-mille keep rate for the reference slice: 1000 (identity)
    at or below the cap, else ⌈1000·cap/ref_n⌉ — the sampled-fit
    law's shape, exact integer arithmetic both engines."""
    if ref_n <= CCNET_REF_CAP:
        return 1000
    return (1000 * CCNET_REF_CAP + ref_n - 1) // ref_n


def docs_ccnet_perplexity_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-doc CCNet bucket: (doc_id, lang, mean_prob_fp,
    is_reference, bucket) with bucket ∈ head/middle/tail by
    per-language reference terciles of the exact fixed-point mean
    bigram probability (higher mean prob = lower perplexity = head;
    boundary docs — score equal to a cutoff — take the better
    bucket, deterministically in both engines)."""
    from ..functions.hashing import minhash_value

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    mean_fp = F.expr(
        "CASE WHEN n_bigrams > 0 THEN sum_prob_fp div n_bigrams ELSE 0 END"
    )
    s = (
        ngram_lm_score(spark, sf_dir)
        .join(d, "doc_id")
        .select("doc_id", "lang", mean_fp.alias("mean_prob_fp"))
    )
    is_ref = F.col("doc_id") % CCNET_REF_MOD == 0
    ref = s.where(is_ref)
    permille = _ccnet_thin_permille(_ccnet_ref_count(spark, sf_dir))
    if permille < 1000:
        # never at gate SFs; pinned by test_ccnet_thinning_composes
        ref = ref.where(minhash_value(F.col("doc_id"), 7) % 1000 < permille)
    cuts = (
        ref.groupBy("lang")
        .agg(F.array_sort(F.collect_list("mean_prob_fp")).alias("arr"))
        .select(
            "lang",
            F.expr(
                "element_at(arr, cast(ceil(size(arr) / 3.0) as int))"
            ).alias("c1"),
            F.expr(
                "element_at(arr, cast(ceil(2 * size(arr) / 3.0) as int))"
            ).alias("c2"),
        )
    )
    bucket = (
        F.when(F.col("c1").isNull(), F.lit("unbucketed"))
        .when(F.col("mean_prob_fp") < F.col("c1"), F.lit("tail"))
        .when(F.col("mean_prob_fp") < F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    return s.join(F.broadcast(cuts), "lang", "left").select(
        "doc_id",
        "lang",
        "mean_prob_fp",
        is_ref.alias("is_reference"),
        bucket.alias("bucket"),
    )


def docs_ccnet_buckets_oracle(sf_dir: str) -> str:
    """Lazy DuckDB twin (callable because the thinning rate is a
    function of the reference count — identity at every gate SF):
    the LM score CTE verbatim, the same integer mean, the same sorted
    array cutoffs, the same CASE."""
    from ..functions.hashing import affine_sql
    from ..session import active_or_local

    spark = active_or_local("ccnet_oracle")
    permille = _ccnet_thin_permille(_ccnet_ref_count(spark, sf_dir))
    thin = (
        f" AND {affine_sql('doc_id', 7)} % 1000 < {permille}"
        if permille < 1000
        else ""
    )
    return f"""
WITH lm AS ({NGRAM_LM_SCORE_SQL}),
s AS (
  SELECT lm.doc_id, d.lang,
         CASE WHEN n_bigrams > 0 THEN sum_prob_fp // n_bigrams
              ELSE 0 END AS mean_prob_fp
  FROM lm JOIN documents d ON lm.doc_id = d.doc_id
),
ref AS (
  SELECT lang, list_sort(list(mean_prob_fp)) AS arr
  FROM s WHERE doc_id % {CCNET_REF_MOD} = 0{thin}
  GROUP BY lang
),
cut AS (
  SELECT lang,
         arr[CAST(ceil(len(arr) / 3.0) AS INT)] AS c1,
         arr[CAST(ceil(2 * len(arr) / 3.0) AS INT)] AS c2
  FROM ref
)
SELECT s.doc_id, s.lang, s.mean_prob_fp,
       (s.doc_id % {CCNET_REF_MOD} = 0) AS is_reference,
       CASE WHEN c1 IS NULL THEN 'unbucketed'
            WHEN mean_prob_fp < c1 THEN 'tail'
            WHEN mean_prob_fp < c2 THEN 'middle'
            ELSE 'head' END AS bucket
FROM s LEFT JOIN cut USING (lang)
"""


QUERIES = {
    "ngram_lm_score": (ngram_lm_score, NGRAM_LM_SCORE_SQL),
    "docs_ccnet_perplexity_buckets": (
        docs_ccnet_perplexity_buckets,
        docs_ccnet_buckets_oracle,
    ),
    "ngram_repeated_spans": (ngram_repeated_spans, NGRAM_REPEATED_SPANS_SQL),
    "ngram_maximal_spans": (ngram_maximal_spans, NGRAM_MAXIMAL_SPANS_SQL),
    "ngram_backoff_score": (ngram_backoff_score, NGRAM_BACKOFF_SQL),
    "docs_scrub_repeated_spans": (docs_scrub_repeated_spans, DOCS_SCRUB_SPANS_SQL),
}
