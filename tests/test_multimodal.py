"""Multimodal plumbing tests: schemas, Arrow batch shape, cardinality
behavior of the stubbed decode kernels, and the oracle-checked
metadata slice."""

from __future__ import annotations

import pytest

from robin_sparkles_spark.operators import multimodal as mm

from .oracle_utils import assert_query_matches_oracle


def test_media_table_schema(spark, sf_dir):
    df = mm.media_from_documents(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == ["media_id", "payload", "mime", "meta"]
    row = df.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta["lang"]


def test_decode_stub_shapes(spark, sf_dir):
    media = mm.media_from_documents(spark, sf_dir)
    decoded = mm.decode_media_stub(media)
    assert decoded.schema == mm.DECODED_SCHEMA
    rows = decoded.collect()
    assert len(rows) == media.count()  # 1:1 decode
    for r in rows[:10]:
        assert 64 <= r.width < 64 + 512
        assert r.n_bytes > 0
        assert len(r.features) == 4


def test_frame_sample_expands_cardinality(spark, sf_dir):
    media = mm.media_from_documents(spark, sf_dir)
    frames = mm.frame_sample_stub(media, every_n=2)
    n_media = media.count()
    n_frames = frames.count()
    assert n_frames >= n_media  # ≥1 frame per media row
    first = frames.where("frame_idx = 0").count()
    assert first == n_media


def test_resize_stub_shrinks_payload_1to1(spark, sf_dir):
    """Resize is the column-transforming mapInPandas shape: same
    cardinality, target dimensions, payload bytes reduced
    proportionally to the area ratio."""
    from pyspark.sql import functions as F

    media = mm.media_from_documents(spark, sf_dir)
    decoded = mm.decode_media_stub(media).select("media_id", "width", "height")
    src = decoded.join(media.select("media_id", "payload"), "media_id")
    resized = mm.resize_stub(src, target_w=32, target_h=32)
    rows = {r.media_id: r for r in resized.collect()}
    orig = {r.media_id: r for r in src.collect()}
    assert set(rows) == set(orig)  # 1:1
    for mid, r in rows.items():
        assert (r.width, r.height) == (32, 32)
        o = orig[mid]
        assert len(r.payload) <= len(o.payload)
        if o.width * o.height > 32 * 32:
            assert len(r.payload) < len(o.payload) or len(o.payload) <= 1


def test_audio_stub_raises_cleanly(spark, sf_dir):
    media = mm.media_from_documents(spark, sf_dir)
    with pytest.raises(Exception, match="NotImplementedError|audio decode"):
        mm.audio_features_stub(media).collect()


def test_multimodal_meta_oracle(spark, sf_dir):
    fn, oracle = mm.QUERIES["multimodal_meta"]
    assert_query_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)
