"""Archive/web-corpus parser tests (r7): pure-Python round trips,
corruption rejection, and Spark-vs-DuckDB oracle parity."""

from __future__ import annotations

import struct
import zlib

import pytest

from robin_sparkles_spark.operators import archive_parse as A
from robin_sparkles_spark.registry import resolve_oracle

from .oracle_utils import assert_query_matches_oracle


def test_archive_roundtrips_pure_python():
    for m in (0, 1, 7, 40, 137, 499):
        d = A.parse_warc(A.synth_warc(m))
        n = A._warc_params(m)
        lens = [A._warc_payload_len(m, i) for i in range(n)]
        types = [A._warc_type(m, i) for i in range(n)]
        assert d["n_records"] == n
        assert d["n_responses"] == types.count("response")
        assert d["n_requests"] == types.count("request")
        assert (d["sum_content_length"], d["max_content_length"]) == (
            sum(lens), max(lens),
        )

        d = A.parse_zip(A.synth_zip(m))
        n = A._zip_params(m)
        assert d["n_members"] == n
        assert d["n_deflated"] == sum(1 for i in range(n) if i % 2 == 0)
        assert d["sum_uncompressed"] == sum(
            A._zip_member_len(m, i) for i in range(n)
        )
        # decompressed content reproduced byte-exactly
        assert d["sum_payload_bytes"] == sum(
            sum(A._zip_member_content(m, i)) for i in range(n)
        )

        d = A.parse_tar(A.synth_tar(m))
        n = A._tar_params(m)
        sizes = [A._tar_member_len(m, i) for i in range(n)]
        assert (d["n_members"], d["sum_member_bytes"]) == (n, sum(sizes))
        assert d["n_blocks"] == sum(1 + (s + 511) // 512 for s in sizes)


def test_warc_gz_roundtrip_pure_python():
    """Member-gzipped WARC: the independent RFC 1952 walk recovers the
    same record stats the plain-WARC parse reports, plus the exact
    decompressed payload byte sum."""
    for m in (0, 1, 7, 40, 137, 499):
        plain = A.parse_warc(A.synth_warc(m))
        gz = A.parse_warc_gz(A.synth_warc_gz(m))
        assert gz["n_members"] == plain["n_records"]
        for k in (
            "n_responses", "n_requests", "sum_content_length",
            "sum_payload_bytes",
        ):
            assert gz[k] == plain[k], (m, k)
        n = A._warc_params(m)
        assert gz["sum_payload_bytes"] == sum(
            (m + i + j) % 95 + 32
            for i in range(n)
            for j in range(A._warc_payload_len(m, i))
        )


def test_warc_gz_member_walk_handles_optional_header_fields():
    """The parser walks FNAME/FEXTRA/FCOMMENT/FHCRC fields a generic
    gzip writer may emit (stdlib gzip.compress emits none)."""
    import gzip as _gzip
    import io

    record = A.synth_warc(5)  # one file's records as a single member?
    # build one member per record with an FNAME field
    out = bytearray()
    buf = io.BytesIO()
    with _gzip.GzipFile(
        filename="rec.warc", mode="wb", fileobj=buf, mtime=0
    ) as f:
        f.write(record)
    out += buf.getvalue()
    data, nxt = A._gzip_member(bytes(out), 0)
    assert data == record
    assert nxt == len(out)


def test_warc_gz_member_walk_yields_split_index():
    """The per-member walk returns a valid split index: offsets start
    at 0, members tile the file exactly (offset[i+1] = offset[i] +
    member_bytes[i], summing to the file length), and each member
    slice decodes independently — the property 100 TB range-request
    parallelism rests on."""
    for m in (0, 3, 137, 499):
        blob = A.synth_warc_gz(m)
        members = A.parse_warc_gz_members(blob)
        assert len(members) == A._warc_params(m)
        pos = 0
        for i, r in enumerate(members):
            assert r["rec_idx"] == i
            assert r["offset"] == pos
            # the slice alone is a complete, verifiable member
            data, nxt = A._gzip_member(
                blob[pos : pos + r["member_bytes"]], 0
            )
            assert nxt == r["member_bytes"]
            assert A.parse_warc(data)["n_records"] == 1
            pos += r["member_bytes"]
        assert pos == len(blob)
        # per-member stats agree with the whole-file aggregate
        agg = A.parse_warc_gz(blob)
        assert sum(r["content_length"] for r in members) == agg["sum_content_length"]
        assert sum(r["payload_sum"] for r in members) == agg["sum_payload_bytes"]
        assert sum(r["rtype"] == "response" for r in members) == agg["n_responses"]


def test_warc_zst_roundtrip_and_rejects():
    """zstd frame layer (RFC 8878): the walk recovers exactly the
    plain-WARC record stats plus the skippable/padding frame counts,
    and magic/FCS/truncation corruption raises."""
    for m in (0, 1, 7, 40, 137, 255, 499):
        d = A.parse_warc_zst(A.synth_warc_zst(m))
        plain = A.parse_warc(A.synth_warc(m))
        assert d["n_records"] == plain["n_records"]
        assert d["sum_content_length"] == plain["sum_content_length"]
        assert d["sum_payload_bytes"] == plain["sum_payload_bytes"]
        assert (d["n_skippable"], d["n_padding_frames"]) == (1, 1)
        assert d["sum_padding_bytes"] == A._zstd_pad_len(m)

    blob = bytearray(A.synth_warc_zst(3))
    blob[0] ^= 0xFF  # not a data/skippable magic
    with pytest.raises(ValueError):
        A.parse_warc_zst(bytes(blob))
    b2 = bytearray(A.synth_warc_zst(3))
    p = 8 + (8 + 3 % 9)  # first data frame (after the skippable)
    b2[p + 5] ^= 0x01  # FCS byte → content-size mismatch
    with pytest.raises(ValueError):
        A.parse_warc_zst(bytes(b2))
    with pytest.raises((ValueError, IndexError, Exception)):
        A.parse_warc_zst(A.synth_warc_zst(3)[:-3])  # truncated padding frame


def test_warc_gz_rejects_corruption():
    blob = bytearray(A.synth_warc_gz(3))
    blob[-5] ^= 0xFF  # inside the last member's trailer/stream
    with pytest.raises((ValueError, zlib.error)):
        A.parse_warc_gz(bytes(blob))
    blob2 = bytearray(A.synth_warc_gz(3))
    blob2[0] = 0x1E  # bad magic
    with pytest.raises(ValueError):
        A.parse_warc_gz(bytes(blob2))
    with pytest.raises((ValueError, zlib.error, IndexError)):
        A.parse_warc_gz(A.synth_warc_gz(3)[:-4])  # truncated trailer


def test_archive_parsers_reject_corruption():
    """Integrity checks are real: framing, CRC, and checksum
    violations raise instead of returning garbage stats."""
    warc = bytearray(A.synth_warc(3))
    warc[0] = ord("X")  # break the version line
    with pytest.raises(ValueError):
        A.parse_warc(bytes(warc))
    with pytest.raises((ValueError, IndexError)):
        A.parse_warc(A.synth_warc(3)[:-2])  # broken record terminator

    z = bytearray(A.synth_zip(3))
    # flip a byte inside the first member's compressed data (after the
    # 30-byte local header + name) → CRC-32 or inflate must fail
    z[30 + len("doc_0.txt") + 2] ^= 0xFF
    with pytest.raises((ValueError, zlib.error)):
        A.parse_zip(bytes(z))

    t = bytearray(A.synth_tar(3))
    t[0] ^= 0x01  # name byte changes → header checksum mismatch
    with pytest.raises(ValueError):
        A.parse_tar(bytes(t))


@pytest.mark.parametrize(
    "name",
    [
        "warc_record_stats",
        "warc_gzip_stats",
        "warc_gz_member_stats",
        "warc_zstd_stats",
        "zip_members_stats",
        "tar_archive_stats",
    ],
)
def test_archive_oracle_parity(spark, sf_dir, name):
    fn, oracle = A.QUERIES_TAIL[name]
    assert_query_matches_oracle(
        fn(spark, sf_dir), resolve_oracle(oracle, sf_dir), sf_dir
    )


def test_tfrecord_roundtrip_crc_and_rejects():
    """CRC32C pinned against the standard known-answer vector
    (crc32c('123456789') == 0xE3069283), TFRecord framing + protobuf
    wire walk round-trips, and both CRC checks reject corruption."""
    assert A.crc32c(b"123456789") == 0xE3069283

    for m in (0, 1, 7, 40, 137, 499):
        d = A.parse_tfrecord(A.synth_tfrecord(m))
        n = A._tfrec_params(m)
        assert d["n_records"] == n and d["n_fields"] == 3 * n
        assert d["sum_tokens"] == sum(A._tfrec_tokens(m, i) for i in range(n))
        assert d["sum_text_len"] == sum(
            A._tfrec_text_len(m, i) for i in range(n)
        )

    blob = bytearray(A.synth_tfrecord(3))
    blob[14] ^= 0x01  # flip a payload byte → payload CRC mismatch
    with pytest.raises(ValueError):
        A.parse_tfrecord(bytes(blob))
    blob = bytearray(A.synth_tfrecord(3))
    blob[0] ^= 0x01  # flip the length field → length CRC mismatch
    with pytest.raises(ValueError):
        A.parse_tfrecord(bytes(blob))


def test_tfrecord_oracle_parity(spark, sf_dir):
    fn, oracle = A.QUERIES_TAIL["tfrecord_stats"]
    assert_query_matches_oracle(
        fn(spark, sf_dir), resolve_oracle(oracle, sf_dir), sf_dir
    )


# --- zstd full block layer (r10) ---------------------------------------------


def test_zstd_roundtrips_reference_frames():
    """The load-bearing property of the pure-Python RFC 8878 decoder:
    byte-exact round trips of frames produced by the REFERENCE C
    encoder (libzstd via pyarrow) across compression levels (fast /
    lazy / btopt parses), data shapes (structured text, random,
    runs, polynomial bytes) and sizes up to multi-block frames."""
    import random

    import pyarrow as pa

    from robin_sparkles_spark.operators import zstd_decode as Z

    rng = random.Random(7)
    words = [b"alpha", b"beta", b"https://example.com/", b"WARC/1.0\r\n",
             b"\x00\x01\x02", b"Content-Length: 63\r\n\r\n"]
    cases = []
    for n in (10, 1000, 60000, 300000):
        cases.append(b"".join(rng.choice(words) for _ in range(n // 5 + 1))[:n])
        cases.append(bytes(rng.randrange(256) for _ in range(min(n, 30000))))
        cases.append((b"abcdefgh" * (n // 8 + 1))[:n])
        cases.append(bytes((i * i) % 251 for i in range(min(n, 50000))))
    for level in (1, 3, 9, 19):
        codec = pa.Codec("zstd", compression_level=level)
        for data in cases:
            assert Z.decompress(bytes(codec.compress(data))) == data


def test_zstd_decoder_rejects_corruption():
    import pyarrow as pa
    import pytest as _pytest

    from robin_sparkles_spark.operators import zstd_decode as Z

    data = b"The quick brown fox jumps over the lazy dog. " * 200
    comp = bytearray(pa.Codec("zstd", compression_level=3).compress(data))
    # bad magic
    bad = bytes([comp[0] ^ 1]) + bytes(comp[1:])
    with _pytest.raises(ValueError):
        Z.decompress(bad)
    # flipped payload byte somewhere in the entropy stream: must NOT
    # silently return the original content — either a structural
    # error raises or the output differs (FCS/stream hygiene checks
    # catch most, but a flip can land on decodable garbage)
    flipped = bytearray(comp)
    flipped[len(comp) // 2] ^= 0x10
    try:
        got = Z.decompress(bytes(flipped))
        assert got != data
    except ValueError:
        pass
    # truncation must raise, not return partial content
    with _pytest.raises((ValueError, IndexError, struct.error)):
        Z.decompress(bytes(comp[: len(comp) // 2]))


def test_zstd_fast_path_matches_pure_python():
    """r11 (VERDICT r10 ask #3): the declared hot path now decodes via
    the container's libzstd (`decompress_frame_fast` — header walk in
    Python, entropy work in C). A/B gate: both decoders byte-identical
    (content AND next_pos) frame-by-frame over the staged corpora —
    the real-libzstd members (Huffman+FSE blocks), the synthetic
    RAW/RLE members, and skippable frames."""
    from robin_sparkles_spark.operators import zstd_decode as Z

    for mid in range(12):
        for blob in (A.synth_warc_zst_real(mid), A.synth_warc_zst(mid)):
            pos = 0
            while pos < len(blob):
                py_content, py_next = Z.decompress_frame(blob, pos)
                c_content, c_next = Z.decompress_frame_fast(blob, pos)
                assert py_content == c_content
                assert py_next == c_next
                pos = py_next


def test_zstd_frame_span_matches_decoder_walk():
    """`frame_span` (the header-only walk feeding libzstd) must agree
    with the full decoder on frame boundaries, kinds, and FCS, and
    must enforce the same scope rule for dictionary frames."""
    import pytest as _pytest

    from robin_sparkles_spark.operators import zstd_decode as Z

    blob = A.synth_warc_zst_real(3)
    pos = 0
    while pos < len(blob):
        kind, fcs, nxt = Z.frame_span(blob, pos)
        content, dec_next = Z.decompress_frame(blob, pos)
        assert nxt == dec_next
        if kind == "skip":
            assert content is None and fcs is None
        else:
            assert content is not None
            if fcs is not None:
                assert len(content) == fcs
        pos = nxt
    # dictionary-ID'd frame header: same explicit boundary in both paths
    dict_frame = Z.ZSTD_MAGIC + bytes([0b0010_0001, 0x42]) + b"\x00"
    with _pytest.raises(ValueError, match="dictionary"):
        Z.frame_span(dict_frame, 0)
    with _pytest.raises(ValueError, match="dictionary"):
        Z.decompress_frame(dict_frame, 0)


def test_zstd_spec_guards_per_context():
    """r11 ADVICE guards: Huffman tableLog cap (12) and per-context
    FSE accuracy ceilings (offset 8, Huffman-weight FSE 6) reject
    out-of-spec tables instead of silently accepting them."""
    import pytest as _pytest

    from robin_sparkles_spark.operators import zstd_decode as Z

    # accuracy-log nibble 15 → 5+15=20 > every ceiling; the table
    # bytes below declare it in the low nibble of the first byte
    bad = bytes([0x0F, 0x00, 0x00, 0x00, 0x00])
    with _pytest.raises(ValueError, match="accuracy log"):
        Z.read_fse_table(bad, 0, 35, max_accuracy=9)
    # accuracy log 9 is fine for LL/ML but must be rejected at the
    # offset-table ceiling (8) and the Huffman-weight ceiling (6)
    acc9 = bytes([0x04]) + bytes(4)  # nibble 4 → accuracy 9
    with _pytest.raises(ValueError, match="> 8"):
        Z.read_fse_table(acc9, 0, 31, max_accuracy=8)
    with _pytest.raises(ValueError, match="> 6"):
        Z.read_fse_table(acc9, 0, 15, max_accuracy=6)


def test_zstd_dictionary_boundary_probe():
    """r11 (VERDICT r10 ask #5): the PROBE that proves the dictionary
    boundary. Supporting dictionary-ID'd frames requires a reference
    encoder that can PRODUCE them (the r10 bring-up caught 3 real bugs
    only against libzstd output; self-produced ground truth is the
    documented trap). This container has none: pyarrow's Codec exposes
    no dictionary entry points and no `zstandard` module ships. If
    either half of this probe ever fails, the boundary justification
    is gone — implement dictionary frames that round."""
    import importlib.util

    import pyarrow as pa

    codec_api = {a for a in dir(pa.Codec("zstd")) if not a.startswith("_")}
    assert not {a for a in codec_api if "dict" in a.lower()}, (
        f"pyarrow Codec grew a dictionary API ({codec_api}) — the "
        "documented zstd-dictionary boundary no longer holds"
    )
    assert importlib.util.find_spec("zstandard") is None, (
        "the zstandard module is now available — the documented "
        "zstd-dictionary boundary no longer holds"
    )
    # and both decode paths REJECT such frames rather than mis-decoding
    from robin_sparkles_spark.operators import zstd_decode as Z

    dict_frame = Z.ZSTD_MAGIC + bytes([0b0010_0001, 0x42]) + b"\x00"
    for fn in (Z.decompress_frame, Z.decompress_frame_fast):
        with pytest.raises(ValueError, match="dictionary"):
            fn(dict_frame, 0)


def test_zstd_skippable_and_concatenated_frames():
    import pyarrow as pa

    from robin_sparkles_spark.operators import zstd_decode as Z

    c = pa.Codec("zstd")
    a, b = b"first frame " * 30, b"second frame " * 17
    skip = struct.pack("<II", Z.SKIP_MAGIC_LO | 5, 4) + b"\x00\x01\x02\x03"
    blob = skip + bytes(c.compress(a)) + skip + bytes(c.compress(b))
    assert Z.decompress(blob) == a + b


def test_warc_zstd_deep_oracle_parity(spark, sf_dir):
    fn, oracle = A.QUERIES_TAIL["warc_zstd_deep_stats"]
    assert_query_matches_oracle(
        fn(spark, sf_dir), resolve_oracle(oracle, sf_dir), sf_dir
    )


def test_zstd_content_checksum_flag_consumed():
    """Frames with the Content_Checksum flag set carry 4 trailing
    xxhash64 bytes: the decoder must consume them structurally (so a
    following concatenated frame still parses) even though
    verification is out of scope. Constructed by setting FHD bit 2 on
    a real libzstd frame and appending 4 bytes — a spec-valid frame."""
    import pyarrow as pa

    from robin_sparkles_spark.operators import zstd_decode as Z

    data = b"checksummed frame payload " * 40
    comp = bytearray(pa.Codec("zstd", compression_level=3).compress(data))
    assert not (comp[4] & 0x04), "expected no checksum flag from pyarrow"
    comp[4] |= 0x04  # set Content_Checksum in the frame header
    checksummed = bytes(comp) + b"\xde\xad\xbe\xef"
    content, pos = Z.decompress_frame(checksummed, 0)
    assert content == data
    assert pos == len(checksummed)  # the 4 checksum bytes consumed
    # and a concatenated second frame after it still decodes
    tail = b"second " * 11
    blob = checksummed + bytes(pa.Codec("zstd").compress(tail))
    assert Z.decompress(blob) == data + tail


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    chunks=st.lists(
        st.one_of(
            st.binary(min_size=0, max_size=200),
            st.sampled_from(
                [b"WARC/1.0\r\n", b"Content-Length: 63\r\n\r\n",
                 b"http://example.com/page/", b"\x00" * 50, b"abab" * 25]
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    level=st.sampled_from([1, 3, 9, 19]),
)
@settings(max_examples=25, deadline=None)
def test_zstd_roundtrip_hypothesis(chunks, level):
    """Permanent randomized guard for the pure-Python zstd decoder:
    arbitrary mixes of random bytes and compressible motifs must
    round-trip byte-exactly through frames the reference C encoder
    produces at every parse strategy (fast/lazy/btopt)."""
    import pyarrow as pa

    from robin_sparkles_spark.operators import zstd_decode as Z

    data = b"".join(chunks)
    comp = bytes(pa.Codec("zstd", compression_level=level).compress(data))
    assert Z.decompress(comp) == data
