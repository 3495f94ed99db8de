"""Image-text pair curation (r11): group structure, keeper policy,
and retention accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from robin_sparkles_spark.operators.multimodal_curation import (
    image_text_pair_curation,
)


def test_one_keeper_per_group_and_groups_are_families(spark, sf_dir):
    out = image_text_pair_curation(spark, sf_dir)
    rows = out.collect()
    assert rows, "pairing must produce rows"
    # exactly one kept pair per image group that received any pair
    kept_per_group: dict[int, int] = {}
    for r in rows:
        kept_per_group[r.img_group] = kept_per_group.get(r.img_group, 0) + (
            1 if r.is_kept else 0
        )
    assert all(v == 1 for v in kept_per_group.values()), (
        "every paired image group keeps exactly one pair"
    )
    # on the de-aliased fixture, groups are exactly the variant
    # families: group label = the family's base img_id
    assert all(r.img_group == (r.img_id // 10) * 10 for r in rows)


def test_keeper_is_argmax_quality(spark, sf_dir):
    """The kept doc has the max (quality_score, -doc_id) among the
    group's paired docs — recomputed independently here."""
    from robin_sparkles_spark.operators.text_analysis import text_quality

    out = image_text_pair_curation(spark, sf_dir)
    q = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    joined = out.join(q, "doc_id").collect()
    by_group: dict[int, list] = {}
    for r in joined:
        by_group.setdefault(r.img_group, []).append(r)
    for g, members in by_group.items():
        best = min(members, key=lambda r: (-r.quality_score, r.doc_id))
        for r in members:
            assert r.is_kept == (r.doc_id == best.doc_id), (
                f"group {g}: keeper policy violated at doc {r.doc_id}"
            )


def test_variant_pairing_only_targets_staged_images(spark, sf_dir):
    """The pairing arithmetic never points at an img_id that does not
    exist in the staged corpus (the residue rules guarantee it)."""
    from robin_sparkles_spark.operators.image_dedup import stage_image_corpus

    out = image_text_pair_curation(spark, sf_dir)
    imgs = spark.read.parquet(stage_image_corpus(spark, sf_dir)).select(
        "img_id"
    )
    dangling = (
        out.join(imgs, "img_id", "left_anti").count()
    )
    assert dangling == 0
    # both variant kinds actually get paired on this fixture
    kinds = {
        r.v for r in out.select((F.col("img_id") % 10).alias("v")).distinct().collect()
    }
    assert kinds == {0, 1, 2}
