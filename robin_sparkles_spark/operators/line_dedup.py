"""Cross-document LINE dedup (r13, EXT) — the C4/CCNet-style cleaning
pass that removes boilerplate LINES repeated across the corpus
(navigation text, cookie banners, license headers) while keeping each
document's unique content in order.

This is a different axis from every other dedup family here: document-
level dedup (exact/MinHash/SimHash/n-gram/containment) drops whole
documents; line dedup edits INSIDE documents — the C4 pipeline's
"discard any line occurring ≥ 3 times in the corpus" rule (Raffel et
al. 2020 §2.2; CCNet dedups the same way at paragraph granularity).
A crawled corpus is full of documents that are 90% unique prose + 10%
shared chrome; line dedup is what makes that 10% not dominate the
token distribution.

Corpus: fixture documents are single-line synthetic text with no
shared lines, so — the planted-corpus pattern (``embedding_dedup``,
``containment``) — staging appends, for every doc_id % 4 == 0, two
boilerplate lines drawn from a 5-line pool (line j of doc i is pool
index (i + j) mod 5 — deterministic, JVM-side). Each pool line lands
in ~n/10 documents, far above the removal threshold, while original
text lines stay under it except organic exact-dup groups of ≥
LINE_DUP_DF documents — which the C4 rule REALLY does blank out, and
both engines mirror.

Semantics (hash-gated): split on newline, count each line's
corpus-wide OCCURRENCE count (C4's rule is occurrence-based — a line
repeated 3× inside one document is removed too, matching Raffel et
al.'s "three-sentence span occurring more than once" spirit; NOT a
distinct-document frequency), drop lines with count ≥ LINE_DUP_DF,
reassemble survivors in original order. Output per doc:
(doc_id, n_lines, n_removed, clean_md5) — the md5 of the reassembled
text (identical bytes ⇒ identical digest in any engine; empty string
when everything was boilerplate).

Plan shape (100 TB posture): one explode (docs × lines-per-doc rows),
a groupBy(line) partial-aggregated occurrence count joined back on
the line value (AQE-skew-splittable; a line-keyed WINDOW would
co-locate every occurrence of a corpus-hot boilerplate line in one
task — VERDICT r13 #1), one groupBy(doc_id) reassembly.
No self-join at all — line dedup is aggregation-shaped, strictly
cheaper than any pair-forming family; the only wide row is the
per-doc collect_list, bounded by document size exactly like the
shingle-set payloads the jaccard verify already carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table
from ..sources.staging import is_staged, staged_path

LINE_DUP_DF = 3  # remove a line with >= this many corpus-wide OCCURRENCES
# (C4's occurrence-based rule: in-document repeats count — ADVICE r13)
BOILER_POOL = 5
BOILER_LINES_PER_DOC = 2
BOILER_EVERY = 4  # doc_id % BOILER_EVERY == 0 docs get boilerplate


def line_dedup_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "line_dedup_docs", "documents")


def build_line_dedup_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently stage documents with planted boilerplate lines
    (deterministic pool assignment — see module docstring)."""
    path = line_dedup_corpus_path(sf_dir)
    if is_staged(path):
        return path
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    boiler = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(BOILER_LINES_PER_DOC - 1)),
            lambda j: F.concat(
                F.lit("boilerplate navigation line "),
                ((F.col("doc_id") + j) % BOILER_POOL).cast("string"),
            ),
        ),
        "\n",
    )
    planted = F.when(
        F.col("doc_id") % BOILER_EVERY == 0,
        F.concat_ws("\n", F.col("text"), boiler),
    ).otherwise(F.col("text"))
    n_files = max(4, min(64, n_docs // 8192))
    docs.select("doc_id", planted.alias("text")).repartition(
        n_files
    ).write.mode("overwrite").parquet(path)
    return path


def docs_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document line-dedup report over the planted corpus:
    (doc_id, n_lines, n_removed, clean_md5)."""
    corpus = spark.read.parquet(build_line_dedup_corpus(spark, sf_dir))
    base = corpus.select(
        "doc_id", F.split(F.col("text"), "\n").alias("arr")
    )
    lines = base.select(
        "doc_id",
        F.size("arr").alias("n_lines"),
        F.posexplode("arr").alias("pos", "line"),
    )
    # corpus-wide occurrence count via groupBy + join-back, NOT a
    # line-keyed window (VERDICT r13 #1): a window puts every
    # occurrence of a corpus-hot boilerplate line — the exact thing
    # this pass removes — in one un-splittable task; the groupBy gets
    # map-side partial aggregation, the surviving-lines side is
    # pre-filtered below the threshold so hot lines never enter the
    # join's build side, and AQE skew splitting covers the join.
    dfs = (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") < LINE_DUP_DF)
    )
    kept = lines.join(dfs.hint("shuffle_hash"), "line")
    rebuilt = kept.groupBy("doc_id").agg(
        F.first("n_lines").alias("n_lines"),
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "line"))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean"),
    )
    # docs whose every line was boilerplate drop out of the groupBy —
    # restore them with an empty clean text (md5('') both engines)
    return (
        base.select("doc_id", F.size("arr").alias("n_lines"))
        .join(rebuilt.drop("n_lines").hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_lines").cast("long").alias("n_lines"),
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.md5(F.coalesce(F.col("clean"), F.lit(""))).alias("clean_md5"),
        )
    )


def docs_line_dedup_oracle(sf_dir: str) -> str:
    """Lazy DuckDB twin over the SAME staged parquet: identical line
    split, df rule, ordered reassembly, and md5 digest."""
    from ..session import active_or_local

    spark = active_or_local("line_dedup_oracle")
    path = build_line_dedup_corpus(spark, sf_dir)
    return f"""
WITH raw AS (SELECT doc_id, string_split(text, chr(10)) AS arr
             FROM read_parquet('{path}/*.parquet')),
lines AS (
  SELECT doc_id, u.pos, arr[u.pos] AS line
  FROM raw, LATERAL (SELECT unnest(generate_series(1, len(arr))) AS pos) u
),
df AS (SELECT line, COUNT(*) AS df FROM lines GROUP BY line),
kept AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lines l JOIN df USING (line) WHERE df.df < {LINE_DUP_DF}
),
rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS clean
  FROM kept GROUP BY doc_id
)
SELECT r.doc_id,
       CAST(len(r.arr) AS BIGINT) AS n_lines,
       CAST(len(r.arr) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
       md5(COALESCE(k.clean, '')) AS clean_md5
FROM raw r LEFT JOIN rebuilt k USING (doc_id)
"""


QUERIES = {
    "docs_line_dedup": (docs_line_dedup, docs_line_dedup_oracle),
}
