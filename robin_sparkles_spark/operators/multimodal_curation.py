"""Image-text PAIR curation (r11): dedup-aware retention of
interleaved (document, image) training pairs — the LAION/DataComp-
style endpoint that composes three shipped stacks:

1. **Image identity**: perceptual-hash near-dup pairs
   (:mod:`image_dedup`) resolved into image GROUPS by the shared
   min-label propagation (``dedup.propagate_min_labels`` — the same
   pointer-doubling components that back ``dedup_groups``).
2. **Pairing**: each document carries one image by closed-form
   assignment (family f = doc_id % n_base, variant by a residue rule
   that only selects variants that exist) — the fixture stand-in for
   a crawl's (page, image) extraction; all arithmetic, so the oracle
   reproduces it exactly. ``n_base`` enters the plan as a broadcast
   1-row scalar (no driver collect).
3. **Retention policy**: within each image GROUP the pair whose
   document scores highest on the shipped quality signal
   (``text_analysis._quality_parts``; doc_id tie-break) is kept; the
   rest are flagged dropped — near-identical images must not ship
   under many captions, and when they collapse, keep the best text.

Output: one row per pair — (doc_id, img_id, img_group, group_size,
is_kept). Downstream keeps ``is_kept`` rows; the full annotation is
declared so the oracle hashes the whole decision, not just the
survivors.

100 TB posture: the image-group labels are the measured components
machinery over the blocked-join pair graph (hash-sized inputs, 8 B
per image); pairing is an arithmetic equi-join (SHUFFLE_HASH-pinned:
both sides corpus-sized); the keeper argmax is a window over
img_group — bounded partitions, a near-dup image cluster's size is
corpus-independent (same contract as ``dedup_canonical_keepers``).

Reference shape: OBELICS / DataComp image-dedup-then-caption-select;
this is a composition of already-oracle-gated primitives, and its
DuckDB twin recomputes all three legs (recursive-CTE closure over the
closed-form dHash pairs, the same pairing arithmetic, the same
quality window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.barrier import barrier
from ..sources import load_table
from .dedup import propagate_min_labels
from .image_dedup import (
    IMAGE_MAX_HAMMING,
    dedup_image_phash,
    phash_oracle_ctes,
    stage_image_corpus,
)
from .text_analysis import _quality_parts


def image_text_pair_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = spark.read.parquet(stage_image_corpus(spark, sf_dir)).select(
        "img_id", "image_id", "variant"
    )
    # image groups: components over the perceptual-hash pair graph
    ipairs = dedup_image_phash(spark, sf_dir).select("img1", "img2")
    edges = barrier(
        ipairs.select(
            F.col("img1").alias("src"), F.col("img2").alias("dst")
        ).union(
            ipairs.select(F.col("img2").alias("src"), F.col("img1").alias("dst"))
        ),
        "corpus",
        "image pair-graph edges",
    )
    labels = propagate_min_labels(
        imgs.select(F.col("img_id").alias("doc_id")), edges
    ).select(
        F.col("doc_id").alias("img_id"), F.col("group_id").alias("img_group")
    )
    # r16 (guide §2.4, VERDICT r15 #7): group_size rides the label
    # table as a window count over the SAME img_group key instead of a
    # separate groupBy + join-back — one corpus join removed (the
    # label frame is checkpointed by the propagation loop, so the
    # window is one exchange over it, not a replay). Semantics
    # identical: both count label rows (images) per group. Cold A/B
    # reads FLAT at fixture (2.89/2.70 → 2.99/2.69 s med/min of 4 —
    # decode+pairs+propagation dominate this query, the join tail was
    # already parallel slack); kept for the plan shape: one fewer
    # corpus-keyed join at any scale, oracle hash-identical.
    labels = labels.withColumn(
        "group_size", F.count("*").over(W.partitionBy("img_group"))
    )

    # pairing: family f = doc_id % n_base; variant 1/2 only where the
    # residue rules guarantee that variant was staged
    n_base = imgs.where(F.col("variant") == 0).agg(
        F.count("*").alias("n_base")
    )
    d = load_table(spark, sf_dir, "documents")
    _stop, _awl, score = _quality_parts()
    docs = d.select(
        "doc_id", "n_chars", F.col("text")
    ).crossJoin(F.broadcast(n_base))
    f_fam = F.col("doc_id") % F.col("n_base")
    v = (
        F.when((F.col("doc_id") % 3 == 1) & (f_fam % 5 == 0), F.lit(1))
        .when((F.col("doc_id") % 3 == 2) & (f_fam % 7 == 0), F.lit(2))
        .otherwise(F.lit(0))
    )
    pairs = docs.select(
        "doc_id",
        (f_fam * 10 + v).cast("long").alias("img_id"),
        score.alias("quality_score"),
    )

    w = W.partitionBy("img_group").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        # corpus × corpus join: pin SHUFFLE_HASH (r10 audit)
        pairs.join(labels.hint("shuffle_hash"), "img_id")
        .withColumn("is_kept", F.row_number().over(w) == 1)
        .select("doc_id", "img_id", "img_group", "group_size", "is_kept")
    )


def image_text_pair_oracle(sf_dir: str) -> str:
    """DuckDB twin: closed-form dHash pipeline → brute-force pairs →
    recursive min-reachable closure → same pairing arithmetic and
    quality window."""
    from .text_analysis import _QUALITY_SCORE_SQL, _STOP_SQL  # noqa: F401

    return f"""
WITH RECURSIVE {phash_oracle_ctes(sf_dir)},
ipairs AS (
  SELECT a.img_id AS img1, b.img_id AS img2
  FROM hashes a JOIN hashes b ON a.img_id < b.img_id
  WHERE bit_count(xor(a.dh, b.dh)) <= {IMAGE_MAX_HAMMING}
),
edges AS (
  SELECT img1 AS src, img2 AS dst FROM ipairs
  UNION ALL
  SELECT img2 AS src, img1 AS dst FROM ipairs
),
reach(img_id, r) AS (
  SELECT img_id, img_id FROM dims
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.img_id
),
labels AS (SELECT img_id, MIN(r) AS img_group FROM reach GROUP BY img_id),
sizes AS (SELECT img_group, COUNT(*) AS group_size FROM labels GROUP BY img_group),
nb AS (SELECT COUNT(*) AS n_base FROM dims WHERE variant = 0),
t AS (
  SELECT doc_id, n_chars,
         list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
  FROM documents
),
pairs AS (
  SELECT doc_id,
         CAST((doc_id % n_base) * 10
              + CASE WHEN doc_id % 3 = 1 AND (doc_id % n_base) % 5 = 0 THEN 1
                     WHEN doc_id % 3 = 2 AND (doc_id % n_base) % 7 = 0 THEN 2
                     ELSE 0 END AS BIGINT) AS img_id,
         {_QUALITY_SCORE_SQL} AS quality_score
  FROM t CROSS JOIN nb
),
ranked AS (
  SELECT p.doc_id, p.img_id, l.img_group, s.group_size,
         ROW_NUMBER() OVER (PARTITION BY l.img_group
                            ORDER BY p.quality_score DESC, p.doc_id ASC) AS rk
  FROM pairs p
  JOIN labels l USING (img_id)
  JOIN sizes s USING (img_group)
)
SELECT doc_id, img_id, img_group, group_size, rk = 1 AS is_kept
FROM ranked
"""


QUERIES = {
    "image_text_pair_curation": (
        image_text_pair_curation,
        image_text_pair_oracle,
    ),
}
