"""Real decode kernels (operators/media_decode): the bytes are real
BMP/WAV files, the kernels really parse them, and the decoded numbers
must equal the synthesis closed form — plus plan-shape checks (mime
filter pushed to the scan, MapInPandas is the only Python node)."""

from __future__ import annotations

import struct

import pytest

from robin_sparkles_spark.operators import media_decode as M
from robin_sparkles_spark.plans.audit import audit_plan


def _expected_bmp(mid: int) -> tuple:
    w = 4 + mid % 13
    h = 3 + mid % 7
    sum_r = sum((3 * mid + x + 7 * y) % 256 for x in range(w) for y in range(h))
    sum_g = sum((2 * mid + 5 * x + y) % 256 for x in range(w) for y in range(h))
    sum_b = sum((mid + 2 * x + 3 * y) % 256 for x in range(w) for y in range(h))
    return (mid, w, h, w * h, sum_r, sum_g, sum_b)


def test_bmp_payload_is_spec_valid():
    blob = M.synth_bmp(7)
    assert blob[:2] == b"BM"
    (file_size,) = struct.unpack_from("<I", blob, 2)
    assert file_size == len(blob)  # header-declared size is the real size
    w, h = struct.unpack_from("<ii", blob, 18)
    row_size = (w * 3 + 3) // 4 * 4
    assert len(blob) == 54 + row_size * h


def test_bmp_decode_matches_closed_form(spark, sf_dir):
    rows = M.bmp_decode_stats(spark, sf_dir).collect()
    assert len(rows) > 0
    by_id = {r.media_id: tuple(r) for r in rows}
    for mid in (0, 1, 42, max(by_id)):
        assert by_id[mid] == _expected_bmp(mid)


def test_wav_decode_matches_closed_form(spark, sf_dir):
    rows = M.wav_decode_stats(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows[:5] + [max(rows, key=lambda r: r.media_id)]:
        mid = r.media_id
        n = 64 + mid % 129
        samples = [((31 * mid + 17 * i) % 4001) - 2000 for i in range(n)]
        assert r.n_samples == n
        assert r.framerate == M.WAV_RATE
        assert r.sum_amp == sum(samples)
        assert r.min_amp == min(samples)
        assert r.max_amp == max(samples)


def test_decode_rejects_non_bmp(spark):
    df = spark.createDataFrame(
        [(1, b"not a bitmap at all")], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a BMP"):
        M.decode_bmp(df).collect()


def test_decode_plan_shape(spark, sf_dir):
    a = audit_plan(M.bmp_decode_stats(spark, sf_dir))
    assert a.map_in_pandas == 1
    assert not a.has_python_eval  # Arrow kernel, not row-at-a-time eval
    # the mime filter reaches the parquet scan
    assert any("mime" in p for p in a.pushed_filters), a.formatted


def test_tiff_frame_sample_parity_and_stride(spark, sf_dir):
    """Byte-parse vs closed-form equality at both strides: the
    declared stride-2 query hash-matches its oracle, and a stride-1
    walk returns every frame (the full IFD chain is parseable, not
    just the sampled prefix)."""
    from pyspark.sql import functions as F

    from robin_sparkles_spark.operators import video_decode
    from robin_sparkles_spark.registry import resolve_oracle

    from .oracle_utils import assert_query_matches_oracle

    fn, orc = video_decode.QUERIES["tiff_frame_sample"]
    assert_query_matches_oracle(fn(spark, sf_dir), resolve_oracle(orc, sf_dir), sf_dir)

    media = spark.read.parquet(video_decode.stage_video_corpus(spark, sf_dir))
    all_frames = video_decode.sample_frames(media, stride=1)
    per_clip = {
        r.media_id: r.n
        for r in all_frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    for mid, n in per_clip.items():
        assert n == 2 + mid % 4, (mid, n)


def test_synth_tiff_roundtrip_single():
    """One clip decoded in plain Python (no Spark): the parser's view
    of frame 0 must equal the synthesis arithmetic exactly."""
    import struct

    import numpy as np

    from robin_sparkles_spark.operators.video_decode import synth_tiff

    mid = 7
    blob = synth_tiff(mid)
    order, magic, ifd_off = struct.unpack_from("<2sHI", blob, 0)
    assert order == b"II" and magic == 42
    (n_entries,) = struct.unpack_from("<H", blob, ifd_off)
    tags = {}
    for i in range(n_entries):
        tag, _t, _c, val = struct.unpack_from("<HHII", blob, ifd_off + 2 + i * 12)
        tags[tag] = val
    w, h = tags[256], tags[257]
    assert (w, h) == (5 + mid % 6, 4 + mid % 5)
    px = np.frombuffer(blob, np.uint8, count=tags[279], offset=tags[273])
    want = [
        (mid + 2 * x + 5 * y) % 256 for y in range(h) for x in range(w)
    ]
    assert px.tolist() == want


def test_png_payload_is_spec_valid_and_uses_all_filters():
    import zlib

    # corpus-wide filter coverage: (id + y) % 5 over h ∈ 3..8 rows
    seen = set()
    for mid in (0, 1, 2, 3, 4, 7):
        blob = M.synth_png(mid)
        assert blob[:8] == M._PNG_SIG
        (ilen,) = struct.unpack_from(">I", blob, 8)
        assert blob[12:16] == b"IHDR" and ilen == 13
        w, h = struct.unpack_from(">II", blob, 16)
        assert w == 5 + mid % 12 and h == 3 + mid % 6
        # inflate the IDAT and read each scanline's filter byte
        pos, idat = 8, bytearray()
        while pos < len(blob):
            (length,) = struct.unpack_from(">I", blob, pos)
            tag = blob[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += blob[pos + 8 : pos + 8 + length]
            pos += 12 + length
        raw = zlib.decompress(bytes(idat))
        stride = w * 3
        assert len(raw) == h * (1 + stride)
        seen.update(raw[y * (1 + stride)] for y in range(h))
    assert seen == {0, 1, 2, 3, 4}  # every PNG filter type exercised


def test_png_decode_matches_closed_form(spark, sf_dir):
    rows = M.png_decode_stats(spark, sf_dir).collect()
    assert len(rows) > 0
    by_id = {r.media_id: r for r in rows}
    for mid in (0, 1, 42, max(by_id)):
        r = by_id[mid]
        w, h = 5 + mid % 12, 3 + mid % 6
        px = [M._png_pixel(mid, x, y) for x in range(w) for y in range(h)]
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert r.sum_r == sum(p[0] for p in px)
        assert r.sum_g == sum(p[1] for p in px)
        assert r.sum_b == sum(p[2] for p in px)


def test_png_decode_rejects_corrupt_crc(spark):
    blob = bytearray(M.synth_png(3))
    blob[-20] ^= 0xFF  # flip a byte inside the IDAT payload
    df = spark.createDataFrame(
        [(3, bytes(blob))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="CRC"):
        M.decode_png(df).collect()


# --- r7 structural container parsers (ISO BMFF / MPEG frames / JFIF) --------


def test_container_roundtrips_pure_python():
    """Every synthesized payload parses back to its closed-form
    parameters — the pure-Python contract the Spark kernels and the
    DuckDB oracles both re-express."""
    from robin_sparkles_spark.operators import container_parse as C

    for m in (0, 1, 7, 40, 137, 499):
        d = C.parse_mp4(C.synth_mp4(m))
        ts, n, delta = C._mp4_params(m)
        sizes = [C._mp4_sample_size(m, i) for i in range(n)]
        assert d["n_boxes"] == C.MP4_N_BOXES
        assert (d["timescale"], d["duration_ticks"]) == (ts, n * delta)
        assert (d["n_samples"], d["sum_sample_bytes"], d["max_sample_bytes"]) == (
            n, sum(sizes), max(sizes),
        )
        d = C.parse_mp3(C.synth_mp3(m))
        frames = [C._mp3_frame(m, i) for i in range(C._mp3_params(m))]
        assert d["n_frames"] == len(frames)
        assert d["total_bytes"] == sum(f[2] for f in frames)
        d = C.parse_jpeg(C.synth_jpeg(m))
        w, h, e = C._jpeg_params(m)
        assert (d["width"], d["height"], d["entropy_bytes"]) == (w, h, e)


def test_container_parsers_reject_corruption():
    """Integrity checks are real: a flipped size field / lost sync /
    truncated stream raises instead of returning garbage."""
    from robin_sparkles_spark.operators import container_parse as C

    mp4 = bytearray(C.synth_mp4(3))
    mp4[0] ^= 0x40  # corrupt ftyp box size
    with pytest.raises(ValueError):
        C.parse_mp4(bytes(mp4))
    # mdat/stsz disagreement: chop the last payload byte
    with pytest.raises(ValueError):
        C.parse_mp4(C.synth_mp4(3)[:-1])

    mp3 = bytearray(C.synth_mp3(3))
    mp3[0] = 0x00  # lost sync
    with pytest.raises(ValueError):
        C.parse_mp3(bytes(mp3))

    jpg = C.synth_jpeg(3)
    with pytest.raises(ValueError):
        C.parse_jpeg(jpg[:-2])  # missing EOI
    with pytest.raises(ValueError):
        C.parse_jpeg(b"\x00" + jpg[1:])  # missing SOI


@pytest.mark.parametrize(
    "name", ["mp4_box_stats", "mp3_frame_stats", "jpeg_marker_stats"]
)
def test_container_oracle_parity(spark, sf_dir, name):
    from robin_sparkles_spark.operators import container_parse as C
    from robin_sparkles_spark.registry import resolve_oracle

    from .oracle_utils import assert_query_matches_oracle

    fn, oracle = C.QUERIES_TAIL[name]
    assert_query_matches_oracle(
        fn(spark, sf_dir), resolve_oracle(oracle, sf_dir), sf_dir
    )


def test_jpeg_entropy_roundtrip_and_rejects():
    """The baseline entropy codec: huffman tables parsed from the
    file's own DHT reproduce the planted coefficients exactly for a
    spread of ids (DC prediction, run/size ACs, ZRL, EOB, byte
    stuffing all exercised), and corruption raises."""
    from robin_sparkles_spark.operators import container_parse as C

    for m in (0, 1, 5, 11, 23, 137, 400, 499):
        d = C.parse_jpeg_entropy(C.synth_jpeg_baseline(m))
        bx, by = C._jpeg_blocks(m)
        nb = bx * by
        coeffs = [C._jpeg_coeffs(m, b) for b in range(nb)]
        assert d["n_blocks"] == nb
        assert d["sum_dc"] == sum(c[0] for c in coeffs)
        assert d["n_nonzero_ac"] == 2 * nb
        assert d["sum_ac_abs"] == sum(
            abs(v) for _, acs in coeffs for _, v in acs
        )

    blob = bytearray(C.synth_jpeg_baseline(7))
    # corrupt a DHT count byte → huffman table no longer matches the
    # scan; the decoder must fail loudly, not return wrong stats
    dht_at = bytes(blob).index(b"\xff\xc4")
    blob[dht_at + 5] ^= 0x01
    with pytest.raises((ValueError, KeyError, IndexError)):
        C.parse_jpeg_entropy(bytes(blob))
    with pytest.raises(ValueError):
        C.parse_jpeg_entropy(C.synth_jpeg_baseline(7)[:-2])  # no EOI


def test_jpeg_entropy_oracle_parity(spark, sf_dir):
    from robin_sparkles_spark.operators import container_parse as C
    from robin_sparkles_spark.registry import resolve_oracle

    from .oracle_utils import assert_query_matches_oracle

    fn, oracle = C.QUERIES_TAIL["jpeg_entropy_stats"]
    assert_query_matches_oracle(
        fn(spark, sf_dir), resolve_oracle(oracle, sf_dir), sf_dir
    )


def test_jpeg_pixel_idct_matches_float_reference():
    """The fixed-point table IDCT against an independent float IDCT
    (NumPy cosine matrices): max 1 level apart after rounding+clamp on
    dense random blocks — the IEEE-1180-style accuracy check."""
    import math

    import numpy as np

    from robin_sparkles_spark.operators import container_parse as C

    x = np.arange(8)
    cos = np.cos((2 * x[:, None] + 1) * x[None, :] * math.pi / 16)
    c = np.ones(8)
    c[0] = 1 / math.sqrt(2)
    basis = cos * c[None, :]

    rng = np.random.default_rng(8)
    worst = 0
    for _ in range(100):
        F = np.zeros((8, 8), dtype=int)
        pos = rng.choice(64, size=int(rng.integers(1, 25)), replace=False)
        F.flat[pos] = rng.integers(-120, 121, size=len(pos))
        zzc = [int(F[u][v]) for (u, v) in C._ZIGZAG]
        got = np.array(C.idct_block_int(zzc, [1] * 64)).reshape(8, 8)
        ref = np.clip(np.round(0.25 * basis @ F @ basis.T + 128), 0, 255)
        worst = max(worst, np.abs(got - ref).max())
    assert worst <= 1, worst


def test_jpeg_pixel_dc_only_block_is_exact_flat():
    """DC-only block: every pixel equals the closed form
    clamp(128 + descale(dc·q·TAB[0])) — the flat-field exactness the
    oracle's arithmetic replay is built on."""
    from robin_sparkles_spark.operators import container_parse as C

    t0 = C._IDCT_TAB[0][0]
    assert all(t == t0 for t in C._IDCT_TAB[0])  # DC basis is flat
    for dc, q in [(0, 1), (100, 24), (-100, 24), (37, 5), (-1, 8)]:
        want_raw = 128 + ((dc * q * t0 + C._IDCT_HALF) >> C._IDCT_S)
        want = min(255, max(0, want_raw))
        zzc = [dc] + [0] * 63
        assert C.idct_block_int(zzc, [q] * 64) == [want] * 64, (dc, q)


def test_jpeg_pixel_decode_roundtrip_and_rejects():
    """Full pixel decode over the planted corpus: stats equal an
    independent recompute from the planted coefficients + quant
    formula; the clamp fires in both directions across the corpus;
    corruption raises."""
    import pytest as _pytest

    from robin_sparkles_spark.operators import container_parse as C

    saw_lo = saw_hi = False
    for m in (0, 1, 5, 11, 23, 137, 400, 499):
        quant = C._pixel_quant(m)
        d = C.parse_jpeg_pixels(C.synth_jpeg_baseline(m, quant=quant))
        bx, by = C._jpeg_blocks(m)
        nb = bx * by
        pix = []
        raws = []
        for b in range(nb):
            dc, acs = C._jpeg_coeffs(m, b)
            zzc = [dc] + [0] * 63
            for p, v in acs:
                zzc[p] = v
            raws += C._idct_block_raw(zzc, quant)
            pix += C.idct_block_int(zzc, quant)
        assert d["n_blocks"] == nb
        assert d["n_pixels"] == 64 * nb == len(pix)
        assert d["sum_pixels"] == sum(pix)
        assert (d["min_pixel"], d["max_pixel"]) == (min(pix), max(pix))
        assert d["n_clipped"] == sum(
            1 for r, p in zip(raws, pix) if r != p
        )
        saw_lo |= d["min_pixel"] == 0
        saw_hi |= d["max_pixel"] == 255
    assert saw_lo and saw_hi, "clamp not exercised in both directions"

    blob = bytearray(C.synth_jpeg_baseline(7, quant=C._pixel_quant(7)))
    dqt_at = bytes(blob).index(b"\xff\xdb")
    blob[dqt_at + 4] = 0x10  # 16-bit quant precision → unsupported
    with _pytest.raises(ValueError):
        C.parse_jpeg_pixels(bytes(blob))
    with _pytest.raises(ValueError):
        C.parse_jpeg_pixels(C.synth_jpeg_baseline(7)[:-2])  # no EOI


def test_jpeg_pixel_oracle_parity(spark, sf_dir):
    from robin_sparkles_spark.operators import container_parse as C
    from robin_sparkles_spark.registry import resolve_oracle

    from .oracle_utils import assert_query_matches_oracle

    fn, oracle = C.QUERIES_TAIL["jpeg_pixel_stats"]
    assert_query_matches_oracle(
        fn(spark, sf_dir), resolve_oracle(oracle, sf_dir), sf_dir
    )


def test_jpeg_progressive_dc_roundtrip_and_rejects():
    """Progressive (SOF2) DC-scan preview decode: flat-block pixel
    stats equal an independent recompute from the planted DCs + quant
    + DC basis entry; baseline frames and AC/refinement scan headers
    are rejected loudly."""
    import pytest as _pytest

    from robin_sparkles_spark.operators import container_parse as C

    for m in (0, 1, 5, 23, 137, 400, 499):
        d = C.parse_jpeg_progressive_dc(C.synth_jpeg_progressive_dc(m))
        bx, by = C._jpeg_blocks(m)
        nb = bx * by
        q0, t0 = C._pixel_quant(m)[0], C._IDCT_TAB[0][0]
        raws = [
            128
            + ((C._jpeg_coeffs(m, b)[0] * q0 * t0 + C._IDCT_HALF)
               >> C._IDCT_S)
            for b in range(nb)
        ]
        pix = [min(255, max(0, r)) for r in raws]
        assert d["n_blocks"] == nb and d["n_pixels"] == 64 * nb
        assert d["sum_pixels"] == 64 * sum(pix)
        assert (d["min_pixel"], d["max_pixel"]) == (min(pix), max(pix))
        assert d["n_clipped"] == 64 * sum(
            1 for r, p in zip(raws, pix) if r != p
        )

    with _pytest.raises(ValueError):
        C.parse_jpeg_progressive_dc(C.synth_jpeg_baseline(7))
    blob = bytearray(C.synth_jpeg_progressive_dc(7))
    sos_at = bytes(blob).index(b"\xff\xda")
    blob[sos_at + 7] = 63  # Se=63 → an AC spectral-selection scan
    with _pytest.raises(ValueError):
        C.parse_jpeg_progressive_dc(bytes(blob))
    blob2 = bytearray(C.synth_jpeg_progressive_dc(7))
    blob2[sos_at + 8] = 0x01  # Al=1 → successive approximation
    with _pytest.raises(ValueError):
        C.parse_jpeg_progressive_dc(bytes(blob2))


def test_jpeg_progressive_dc_oracle_parity(spark, sf_dir):
    from robin_sparkles_spark.operators import container_parse as C
    from robin_sparkles_spark.registry import resolve_oracle

    from .oracle_utils import assert_query_matches_oracle

    fn, oracle = C.QUERIES_TAIL["jpeg_progressive_dc_stats"]
    assert_query_matches_oracle(
        fn(spark, sf_dir), resolve_oracle(oracle, sf_dir), sf_dir
    )


def test_jpeg_progressive_full_decodes_to_baseline_pixels():
    """The complete progressive decode (DC scan + two spectral-
    selection AC scans with EOB-run codes) must produce EXACTLY the
    baseline pixel stats — both corpora plant the same coefficients
    and quant table, so any divergence is a decode bug. Refinement
    (Ah/Al>0) and multi-component scans are rejected loudly."""
    import pytest as _pytest

    from robin_sparkles_spark.operators import container_parse as C

    for m in (0, 1, 5, 23, 137, 400, 499):
        prog = C.parse_jpeg_progressive_pixels(
            C.synth_jpeg_progressive_full(m)
        )
        base = C.parse_jpeg_pixels(
            C.synth_jpeg_baseline(m, quant=C._pixel_quant(m))
        )
        assert prog.pop("n_scans") == 1 + len(C._PROG_BANDS)
        assert prog == base

    # the final AC scan is a single multi-block EOBn run: every block's
    # 30..63 band is zero, so the whole scan is one code + extra bits
    blob = C.synth_jpeg_progressive_full(11)  # 4x3 blocks -> eobrun 12
    bx, by = C._jpeg_blocks(11)
    assert bx * by == 12
    d = C.parse_jpeg_progressive_pixels(blob)
    assert d["n_blocks"] == 12

    with _pytest.raises(ValueError):
        C.parse_jpeg_progressive_pixels(
            C.synth_jpeg_baseline(7, quant=C._pixel_quant(7))
        )
    # (r9: Al>0 first scans are now SUPPORTED point transforms — see
    # test_jpeg_progressive_sa_decodes_to_baseline_pixels; the grammar
    # rejection kept here is a refinement that skips a bit plane)
    blob = bytearray(C.synth_jpeg_progressive_full(7))
    sos_at = bytes(blob).index(b"\xff\xda")
    blob[sos_at + 9] = 0x31  # Ah=3, Al=1 — skips bit plane 2
    with _pytest.raises(ValueError):
        C.parse_jpeg_progressive_pixels(bytes(blob))


def test_jpeg_progressive_pixel_oracle_parity(spark, sf_dir):
    from robin_sparkles_spark.operators import container_parse as C
    from robin_sparkles_spark.registry import resolve_oracle

    from .oracle_utils import assert_query_matches_oracle

    fn, oracle = C.QUERIES_TAIL["jpeg_progressive_pixel_stats"]
    assert_query_matches_oracle(
        fn(spark, sf_dir), resolve_oracle(oracle, sf_dir), sf_dir
    )


def test_jpeg_progressive_sa_decodes_to_baseline_pixels():
    """Successive-approximation progressive decode: the 5-scan script
    (DC/AC first scans at Al=1, bit-0 refinement scans with
    correction bits + newly-significant ±1 codes, EOBn tail band)
    reconstructs EXACTLY the baseline pixels for every planted
    block. Also pins the refinement grammar: a refinement scan whose
    point transform drops by more than one bit is rejected."""
    import pytest as _pytest

    from robin_sparkles_spark.operators import container_parse as C

    for m in (0, 1, 5, 23, 137, 400, 499):
        sa = C.parse_jpeg_progressive_pixels(C.synth_jpeg_progressive_sa(m))
        base = C.parse_jpeg_pixels(
            C.synth_jpeg_baseline(m, quant=C._pixel_quant(m))
        )
        assert sa.pop("n_scans") == len(C._SA_SCRIPT)
        assert sa == base

    blob = bytearray(C.synth_jpeg_progressive_sa(7))
    sos_at = bytes(blob).index(b"\xff\xda")
    blob[sos_at + 9] = 0x20  # Ah=2, Al=0 — skips a bit plane
    with _pytest.raises(ValueError):
        C.parse_jpeg_progressive_pixels(bytes(blob))


def test_jpeg_progressive_sa_oracle_parity(spark, sf_dir):
    from robin_sparkles_spark.operators import container_parse as C
    from robin_sparkles_spark.registry import resolve_oracle

    from .oracle_utils import assert_query_matches_oracle

    fn, oracle = C.QUERIES_TAIL["jpeg_progressive_sa_stats"]
    assert_query_matches_oracle(
        fn(spark, sf_dir), resolve_oracle(oracle, sf_dir), sf_dir
    )


def test_bmp_resize_and_wav_features_closed_form(spark, sf_dir):
    """The r9 preprocessing stages vs independent recomputes: the 2×2
    floor-mean resize equals a per-pixel replay of the synthesis
    formulas, and the frame features equal a plain-Python framing of
    the synthesized samples."""
    rows = {r.media_id: r for r in M.bmp_resize_stats(spark, sf_dir).collect()}
    for mid in (0, 1, 7, 42, max(rows)):
        w, h = 4 + mid % 13, 3 + mid % 7
        w2, h2 = w // 2, h // 2
        def px(x, y):
            return (
                (3 * mid + x + 7 * y) % 256,
                (2 * mid + 5 * x + y) % 256,
                (mid + 2 * x + 3 * y) % 256,
            )
        sums = [0, 0, 0]
        for x2 in range(w2):
            for y2 in range(h2):
                for c in range(3):
                    sums[c] += (
                        px(2 * x2, 2 * y2)[c]
                        + px(2 * x2 + 1, 2 * y2)[c]
                        + px(2 * x2, 2 * y2 + 1)[c]
                        + px(2 * x2 + 1, 2 * y2 + 1)[c]
                    ) // 4
        r = rows[mid]
        assert (r.out_w, r.out_h, r.n_out_pixels) == (w2, h2, w2 * h2)
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(sums)

    feats = {r.media_id: r for r in M.wav_frame_features(spark, sf_dir).collect()}
    for mid in (0, 1, 7, 42, max(feats)):
        n = 64 + mid % 129
        s = [((31 * mid + 17 * i) % 4001) - 2000 for i in range(n)]
        nf = n // M.WAV_FRAME
        energies, zcs = [], 0
        for f in range(nf):
            fr = s[f * M.WAV_FRAME : (f + 1) * M.WAV_FRAME]
            energies.append(sum(v * v for v in fr))
            zcs += sum(
                1 for a, b in zip(fr, fr[1:]) if (a >= 0) != (b >= 0)
            )
        r = feats[mid]
        assert r.n_frames == nf
        assert r.total_energy == sum(energies)
        assert r.max_frame_energy == max(energies)
        assert r.total_zc == zcs


def test_jpeg_progressive_property_random_blocks():
    """Property test over the progressive coders: for RANDOM sparse
    coefficient blocks (AC magnitudes 1..15 at arbitrary positions,
    signed DCs), both the spectral-selection and the successive-
    approximation scan scripts must reconstruct pixel stats equal to
    a DIRECT integer-IDCT of the same blocks — exercising ZRL runs,
    long EOBn runs, refinement corrections, and newly-significant
    placements that the fixed plant never reaches."""
    from hypothesis import given, settings, strategies as st

    from robin_sparkles_spark.operators import container_parse as C

    mid = 11  # 4x3 = 12 blocks
    n_blocks = 12
    quant = C._pixel_quant(mid)

    block_st = st.builds(
        lambda dc, acs: [dc]
        + [0] * 63
        if not acs
        else [dc] + [dict(acs).get(p, 0) for p in range(1, 64)],
        # DC table covers size categories 0..8 → |diff| ≤ 255, so DCs
        # stay in ±127 (prediction diffs then max at 254)
        st.integers(-127, 127),
        st.lists(
            st.tuples(
                st.integers(1, 63),
                st.integers(-15, 15).filter(lambda v: v != 0),
            ),
            max_size=12,
        ),
    )

    def expected(blocks):
        sum_pix = n_clip = 0
        mn, mx = 255, 0
        for blk in blocks:
            for raw in C._idct_block_raw(blk, quant):
                pix = 0 if raw < 0 else 255 if raw > 255 else raw
                n_clip += pix != raw
                sum_pix += pix
                mn, mx = min(mn, pix), max(mx, pix)
        return {
            "n_blocks": n_blocks,
            "n_pixels": 64 * n_blocks,
            "sum_pixels": sum_pix,
            "min_pixel": mn,
            "max_pixel": mx,
            "n_clipped": n_clip,
        }

    @settings(max_examples=40, deadline=None)
    @given(st.lists(block_st, min_size=n_blocks, max_size=n_blocks))
    def check(blocks):
        want = expected(blocks)
        full = C.parse_jpeg_progressive_pixels(
            C.synth_jpeg_progressive_full(mid, blocks=blocks)
        )
        assert full.pop("n_scans") == 3
        assert full == want
        sa = C.parse_jpeg_progressive_pixels(
            C.synth_jpeg_progressive_sa(mid, blocks=blocks)
        )
        assert sa.pop("n_scans") == 5
        assert sa == want

    check()
