"""Multimodal metadata-catalog tests: oracle parity of the pure-
Catalyst header sniff, and the stronger cross-check that sniffed
dimensions equal what the REAL decode kernels extract from the full
byte streams (header sniff == full decode — r10, stubs retired)."""

from __future__ import annotations

from robin_sparkles_spark.operators import media_decode as md
from robin_sparkles_spark.operators import multimodal as mm
from robin_sparkles_spark.registry import resolve_oracle

from .oracle_utils import assert_query_matches_oracle


def test_multimodal_meta_oracle(spark, sf_dir):
    fn, oracle = mm.QUERIES["multimodal_meta"]
    assert_query_matches_oracle(
        fn(spark, sf_dir), resolve_oracle(oracle, sf_dir), sf_dir
    )


def test_meta_covers_whole_corpus_with_typed_nulls(spark, sf_dir):
    rows = mm.multimodal_meta(spark, sf_dir).collect()
    n_media = spark.read.parquet(md.media_corpus_path(sf_dir)).count()
    assert len(rows) == n_media  # map-only catalog: one row per file
    for r in rows:
        assert r.n_bytes > 0
        if r.mime == "image/bmp":
            assert r.width is not None and r.height is not None
            assert r.sample_rate is None and r.n_samples is None
        else:
            assert r.mime == "audio/wav"
            assert r.width is None and r.height is None
            assert r.sample_rate == md.WAV_RATE


def test_header_sniff_matches_full_decode(spark, sf_dir):
    """The load-bearing property: dimensions sniffed from fixed header
    offsets must equal what the real pixel/sample decoders recover
    from the complete byte streams."""
    meta = {(r.media_id, r.mime): r for r in mm.multimodal_meta(spark, sf_dir).collect()}
    for r in md.bmp_decode_stats(spark, sf_dir).collect():
        m = meta[(r.media_id, "image/bmp")]
        assert (m.width, m.height) == (r.width, r.height)
    for r in md.wav_decode_stats(spark, sf_dir).collect():
        m = meta[(r.media_id, "audio/wav")]
        assert m.sample_rate == r.framerate
        assert m.n_samples == r.n_samples


def test_no_python_eval_in_meta_plan(spark, sf_dir):
    """The sniff is pure Catalyst — the metadata pass must not pay the
    Python/Arrow decode path for any row."""
    from robin_sparkles_spark.plans import audit_plan

    a = audit_plan(mm.multimodal_meta(spark, sf_dir))
    assert not a.has_python_eval, a.formatted
    assert a.map_in_pandas == 0, a.formatted
    assert a.exchanges == 0, a.formatted  # map-only: no shuffle at all
