"""REAL media *container* parsers (r7) — the structural half of the
codec slots `multimodal.py` stubs out.

Full JPEG entropy / MP3 audio / MP4 video decode needs codec
libraries this container lacks (the documented boundary). But the
FIRST pass a 100 TB media-metadata pipeline runs is not signal
reconstruction — it is container/structure parsing: box trees, frame
walks, marker scans, the layer that yields dimensions, durations,
sample tables, bitrates, and validates file integrity before any
expensive decode is scheduled. That layer needs nothing but byte
arithmetic, so these three kernels are REAL spec implementations:

- ``mp4_box_stats``: ISO BMFF (MP4) box-tree walk — recursive
  size/type parse into the container boxes, mvhd/mdhd timescale +
  duration, stts sample counts, stsz sample-size table, and an
  integrity check that ``mdat`` holds exactly the bytes stsz
  declares (ISO/IEC 14496-12 box grammar).
- ``mp3_frame_stats``: MPEG-1 Layer III frame walk — 4-byte header
  parse (sync/version/layer validation), bitrate/samplerate table
  lookup, per-frame length arithmetic incl. the padding bit, exact
  duration from the 1152-samples-per-frame constant (ISO/IEC 11172-3).
- ``jpeg_marker_stats``: JPEG/JFIF marker-segment scan — SOI→EOI walk
  over length-prefixed segments, SOF0 dimensions/components, DQT
  table count, entropy-coded-data length (ITU-T T.81 syntax layer).
- ``jpeg_entropy_stats``: one level deeper — a REAL baseline-JPEG
  entropy DECODE (T.81 §F.2): canonical huffman tables built from the
  file's own DHT segments, bit reader with 0xFF00 un-stuffing, DC
  prediction, AC run/size + ZRL + EOB. Planted integer coefficients +
  a unit quant table make the layer lossless, so the oracle is closed
  form; ``jpeg_pixel_stats`` (r8) finishes the decode — dequant +
  fixed-point integer IDCT + level shift + clamp; the progressive
  variants (r9: spectral selection with EOB runs AND successive-
  approximation bit-plane refinement) decode to the same pixels,
  leaving only arithmetic-coded entropy behind the library boundary.

Same verification contract as ``media_decode``: payloads are
synthesized DETERMINISTICALLY from ``media_id`` (driver-side, staged
once via the ``sources.staging`` fingerprint contract), so the DuckDB
oracle recomputes every parsed number in closed form over the same
staged table — agreement of (real byte parse) vs (closed-form
arithmetic) proves the parser, and a header-layout bug cannot cancel
out on the oracle side.

UDF policy: byte-format parses are the sanctioned MapInPandas path;
``tests/test_plans.py`` allowlists exactly these queries. Plan shape:
mime-filtered parquet scan → per-row Arrow-batched projection — no
shuffle, no state, embarrassingly parallel at any scale.
"""

from __future__ import annotations

import struct


from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table
from ..sources.staging import is_staged, stage_width, staged_path

CONTAINER_N = 500  # rows per format (min'd with the doc count)

# --- MP4 / ISO BMFF ---------------------------------------------------------

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
MP4_N_BOXES = 16  # fixed synthesized tree (stsd's sample entry not walked)


def _mp4_params(m: int) -> tuple[int, int, int]:
    """(timescale, n_samples, tick-delta per sample)."""
    return 600 + 100 * (m % 5), 10 + m % 41, 100 + m % 156


def _mp4_sample_size(m: int, i: int) -> int:
    return 50 + (13 * m + 7 * i) % 101


def synth_mp4(media_id: int) -> bytes:
    """A valid minimal ISO BMFF file: ftyp + moov(mvhd, trak(tkhd,
    mdia(mdhd, hdlr, minf(stbl(stsd, stts, stsz, stsc, stco))))) +
    mdat whose payload is exactly the stsz-declared sample bytes."""
    ts, n, delta = _mp4_params(media_id)
    sizes = [_mp4_sample_size(media_id, i) for i in range(n)]

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)            # version 0 + flags
        + struct.pack(">II", 0, 0)      # ctime, mtime
        + struct.pack(">II", ts, n * delta)  # timescale, duration
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)      # volume 1.0
        + bytes(10)                      # reserved
        + bytes(36)                      # identity matrix slot (zeroed)
        + bytes(24)                      # pre_defined
        + struct.pack(">I", 2),          # next_track_ID
    )
    tkhd = box(b"tkhd", bytes(84))       # v0 layout, fields unused here
    mdhd = box(
        b"mdhd",
        struct.pack(">I", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", ts, n * delta)
        + struct.pack(">HH", 0x55C4, 0),  # language "und", pre_defined
    )
    hdlr = box(
        b"hdlr", struct.pack(">I", 0) + bytes(4) + b"vide" + bytes(12) + b"\x00"
    )
    stsd = box(
        b"stsd",
        struct.pack(">I", 0) + struct.pack(">I", 1) + box(b"mp4v", bytes(70)),
    )
    stts = box(
        b"stts",
        struct.pack(">I", 0) + struct.pack(">I", 1) + struct.pack(">II", n, delta),
    )
    stsz = box(
        b"stsz",
        struct.pack(">I", 0)
        + struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stsc = box(
        b"stsc",
        struct.pack(">I", 0) + struct.pack(">I", 1) + struct.pack(">III", 1, n, 1),
    )
    mdat_payload = b"".join(
        bytes((media_id + i + j) % 251 for j in range(s))
        for i, s in enumerate(sizes)
    )

    def assemble(chunk_offset: int) -> bytes:
        # stco carries the absolute offset of the first chunk (the
        # mdat payload); its own size is constant, so assembling once
        # with a placeholder yields the true offset for the second pass
        stco = box(
            b"stco",
            struct.pack(">I", 0)
            + struct.pack(">I", 1)
            + struct.pack(">I", chunk_offset),
        )
        stbl = box(b"stbl", stsd + stts + stsz + stsc + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
        return ftyp + moov

    head = assemble(0)
    head = assemble(len(head) + 8)
    return head + box(b"mdat", mdat_payload)


def parse_mp4(blob: bytes) -> dict:
    """Recursive box walk (ISO/IEC 14496-12 §4.2): every box is
    size(4)+type(4)+payload; container types recurse. Extracts the
    movie/media headers and the full sample-size table, and verifies
    mdat carries exactly the declared sample bytes."""
    out = {
        "n_boxes": 0, "timescale": 0, "duration_ticks": 0,
        "n_samples": 0, "sum_sample_bytes": 0, "max_sample_bytes": 0,
        "mdat_bytes": -1,
    }

    def walk(buf: bytes, lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack_from(">I", buf, pos)[0]
            tag = buf[pos + 4 : pos + 8]
            if size < 8 or pos + size > hi:
                raise ValueError(f"bad box size {size} for {tag!r}")
            out["n_boxes"] += 1
            body_lo, body_hi = pos + 8, pos + size
            if tag in _MP4_CONTAINERS:
                walk(buf, body_lo, body_hi)
            elif tag == b"mvhd":
                ts, dur = struct.unpack_from(">II", buf, body_lo + 12)
                out["timescale"], out["duration_ticks"] = ts, dur
            elif tag == b"stts":
                n_entries = struct.unpack_from(">I", buf, body_lo + 4)[0]
                total = 0
                for e in range(n_entries):
                    cnt, _delta = struct.unpack_from(
                        ">II", buf, body_lo + 8 + 8 * e
                    )
                    total += cnt
                out["n_samples"] = total
            elif tag == b"stsz":
                fixed, cnt = struct.unpack_from(">II", buf, body_lo + 4)
                if fixed:
                    out["sum_sample_bytes"] = fixed * cnt
                    out["max_sample_bytes"] = fixed
                else:
                    sizes = [
                        struct.unpack_from(">I", buf, body_lo + 12 + 4 * e)[0]
                        for e in range(cnt)
                    ]
                    out["sum_sample_bytes"] = sum(sizes)
                    out["max_sample_bytes"] = max(sizes) if sizes else 0
            elif tag == b"mdat":
                out["mdat_bytes"] = body_hi - body_lo
            pos += size

    walk(blob, 0, len(blob))
    if out["mdat_bytes"] != out["sum_sample_bytes"]:
        raise ValueError(
            f"mdat holds {out['mdat_bytes']} bytes but stsz declares "
            f"{out['sum_sample_bytes']}"
        )
    return out


# --- MP3 / MPEG-1 Layer III -------------------------------------------------

# ISO/IEC 11172-3 Table B.2, MPEG-1 Layer III column (kbit/s), indexes
# 1..5 used by the synthesizer.
MP3_BITRATES = (32, 40, 48, 56, 64)
MP3_SAMPLERATE = 44100
MP3_SAMPLES_PER_FRAME = 1152


def _mp3_params(m: int) -> int:
    return 8 + m % 25  # frame count


def _mp3_frame(m: int, i: int) -> tuple[int, int, int]:
    """(bitrate_kbps, padding_bit, frame_length_bytes)."""
    br = MP3_BITRATES[(m + i) % 5]
    pad = (m + i) % 2
    return br, pad, 144_000 * br // MP3_SAMPLERATE + pad


def synth_mp3(media_id: int) -> bytes:
    """A valid MPEG-1 Layer III frame sequence: per frame a 4-byte
    header (sync/version/layer/bitrate-index/samplerate-index/padding)
    followed by exactly the table-derived frame length; body bytes are
    < 0xFF so no spurious sync words appear."""
    frames = bytearray()
    for i in range(_mp3_params(media_id)):
        br, pad, flen = _mp3_frame(media_id, i)
        br_idx = MP3_BITRATES.index(br) + 1
        b2 = (br_idx << 4) | (0 << 2) | (pad << 1)  # samplerate idx 0=44100
        frames += bytes((0xFF, 0xFB, b2, 0xC0))  # sync + MPEG1 + L3 + mono
        frames += bytes(
            (media_id + i + j) % 0x7F for j in range(flen - 4)
        )
    return bytes(frames)


def parse_mp3(blob: bytes) -> dict:
    """Frame walk: validate each header's sync/version/layer, look the
    bitrate/samplerate up in the spec tables, advance by the computed
    frame length. Exact duration from samples-per-frame."""
    pos, n_frames, sum_br = 0, 0, 0
    while pos < len(blob):
        if pos + 4 > len(blob):
            raise ValueError("truncated frame header")
        b0, b1, b2, _b3 = blob[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost sync at {pos}")
        if (b1 >> 3) & 0x3 != 0x3 or (b1 >> 1) & 0x3 != 0x1:
            raise ValueError("not MPEG-1 Layer III")
        br_idx, sr_idx, pad = b2 >> 4, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1
        if not (1 <= br_idx <= len(MP3_BITRATES)) or sr_idx != 0:
            raise ValueError("bitrate/samplerate index outside table")
        br = MP3_BITRATES[br_idx - 1]
        flen = 144_000 * br // MP3_SAMPLERATE + pad
        n_frames += 1
        sum_br += br
        pos += flen
    if pos != len(blob):
        raise ValueError("frame walk overran payload")
    return {
        "n_frames": n_frames,
        "total_bytes": len(blob),
        "sum_bitrate_kbps": sum_br,
        "duration_ms": n_frames * MP3_SAMPLES_PER_FRAME * 1000 // MP3_SAMPLERATE,
    }


# --- JPEG / JFIF ------------------------------------------------------------

JPEG_N_MARKERS = 7  # SOI, APP0, DQT, SOF0, DHT, SOS, EOI


def _jpeg_params(m: int) -> tuple[int, int, int]:
    """(width, height, entropy_bytes)."""
    return 8 * (1 + m % 16), 8 * (1 + m % 8), 20 + m % 50


def synth_jpeg(media_id: int) -> bytes:
    """A syntactically valid JFIF stream: SOI, APP0(JFIF), DQT (one
    8-bit table), SOF0 (3 components, real dimensions), DHT (one
    1-symbol table), SOS + entropy bytes (all < 0xFF — no stuffing
    needed), EOI. Entropy payload is filler: the huffman/IDCT pixel
    path is the documented library boundary."""
    w, h, elen = _jpeg_params(media_id)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", 2 + len(payload)) + payload

    app0 = seg(
        0xE0, b"JFIF\x00" + bytes((1, 1, 0)) + struct.pack(">HH", 1, 1) + bytes(2)
    )
    dqt = seg(
        0xDB, bytes([0x00]) + bytes(1 + (media_id + k) % 100 for k in range(64))
    )
    sof0 = seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3])
        + b"".join(bytes((cid, 0x11, 0)) for cid in (1, 2, 3)),
    )
    dht = seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0]))
    sos = seg(
        0xDA,
        bytes([3]) + b"".join(bytes((cid, 0x00)) for cid in (1, 2, 3)) + bytes((0, 63, 0)),
    )
    entropy = bytes((3 * media_id + j) % 0xFE for j in range(elen))
    return b"\xff\xd8" + app0 + dqt + sof0 + dht + sos + entropy + b"\xff\xd9"


def parse_jpeg(blob: bytes) -> dict:
    """Marker-segment scan (ITU-T T.81 §B): SOI, then length-prefixed
    segments; after SOS the entropy-coded data runs to the next real
    marker (our synth emits none before EOI)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("missing SOI")
    out = {
        "width": 0, "height": 0, "n_components": 0,
        "n_markers": 1, "entropy_bytes": 0,
    }
    pos = 2
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        out["n_markers"] += 1
        if marker == 0xD9:  # EOI
            if pos + 2 != len(blob):
                raise ValueError("bytes after EOI")
            return out
        length = struct.unpack_from(">H", blob, pos + 2)[0]
        body = blob[pos + 4 : pos + 2 + length]
        if marker == 0xC0:  # SOF0
            out["height"], out["width"] = struct.unpack_from(">HH", body, 1)
            out["n_components"] = body[5]
        pos += 2 + length
        if marker == 0xDA:  # SOS → entropy data until next 0xFF marker
            start = pos
            while pos < len(blob) and blob[pos] != 0xFF:
                pos += 1
            out["entropy_bytes"] = pos - start
    raise ValueError("missing EOI")


# --- JPEG baseline ENTROPY layer (huffman-coded DCT coefficients) -----------
#
# One level deeper than the marker scan: a real baseline-JPEG entropy
# DECODE — canonical huffman tables built from the file's own DHT
# segments, a bit reader with 0xFF00 un-stuffing, DC difference
# accumulation, AC run/size + ZRL + EOB semantics (ITU-T T.81 §F.2).
# The synthesizer plants integer DCT coefficients and a unit quant
# table, so the entropy layer is LOSSLESS and the oracle is closed
# form. The PIXEL layer below (r8) finishes the decode with an exact
# integer IDCT; r9 extends it across progressive scan scripts, so
# only arithmetic-coded entropy stays behind the library boundary.

_JDC_BITS = [0] * 16
_JDC_BITS[3] = 9  # DC categories 0..8, all length-4 codes
_JDC_VALS = list(range(9))
_JAC_BITS = [0] * 16
_JAC_BITS[3] = 2   # EOB, ZRL at length 4
_JAC_BITS[6] = 64  # (run 0..15 × size 1..4) at length 7
_JAC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 5)]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG code assignment (T.81 §C.2): symbol -> (code,
    length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = k = 0
    for i, count in enumerate(bits):
        for _ in range(count):
            codes[vals[k]] = (code, i + 1)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_cat(v: int) -> int:
    return abs(v).bit_length()


def _jpeg_coeffs(m: int, b: int) -> tuple[int, list[tuple[int, int]]]:
    """Planted coefficients for block ``b``: a signed DC and two ACs
    at zigzag positions (p1 < 10 ≤ p2, so ordering always holds)."""
    dc = ((m * 5 + b * 3) % 201) - 100
    p1, p2 = 1 + b % 5, 10 + m % 20
    v1 = 1 + (m + b) % 15
    v2 = -(1 + (m + 3 * b) % 7)
    return dc, [(p1, v1), (p2, v2)]


def _jpeg_blocks(m: int) -> tuple[int, int]:
    return 1 + m % 4, 1 + m % 3  # blocks across, blocks down


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # T.81 §F.1.2.3 byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def done(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-bit padding per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = self.acc = self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.data[self.pos] != 0x00:
                    raise ValueError("marker inside entropy data")
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def read_symbol(self, decode_map: dict) -> int:
        code = length = 0
        while True:
            code = (code << 1) | self.read(1)
            length += 1
            sym = decode_map.get((code, length))
            if sym is not None:
                return sym
            if length > 16:
                raise ValueError("invalid huffman code")


def synth_jpeg_baseline(media_id: int, quant: list[int] | None = None) -> bytes:
    """A decodable grayscale baseline JPEG: unit quant table (or the
    caller's, in zigzag order — the pixel corpus plants a real one),
    our own (spec-canonical) huffman tables in DHT, and a scan that
    huffman-codes the planted coefficients with DC prediction,
    run/size AC coding, ZRL and EOB — byte-stuffed per the spec."""
    bx, by = _jpeg_blocks(media_id)
    n_blocks = bx * by
    dc_codes = _huff_codes(_JDC_BITS, _JDC_VALS)
    ac_codes = _huff_codes(_JAC_BITS, _JAC_VALS)

    w = _BitWriter()
    prev_dc = 0
    for b in range(n_blocks):
        dc, acs = _jpeg_coeffs(media_id, b)
        diff, prev_dc = dc - prev_dc, dc
        s = _jpeg_cat(diff)
        code, ln = dc_codes[s]
        w.write(code, ln)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        pos = 0
        for p, v in acs:
            run = p - pos - 1
            while run >= 16:
                code, ln = ac_codes[0xF0]
                w.write(code, ln)
                run -= 16
            s = _jpeg_cat(v)
            code, ln = ac_codes[(run << 4) | s]
            w.write(code, ln)
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            pos = p
        if pos < 63:
            code, ln = ac_codes[0x00]
            w.write(code, ln)
    scan = w.done()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", 2 + len(payload)) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes(quant or [1] * 64))
    sof0 = seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", 8 * by, 8 * bx)
        + bytes([1])
        + bytes((1, 0x11, 0)),
    )
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(_JDC_BITS) + bytes(_JDC_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(_JAC_BITS) + bytes(_JAC_VALS))
    sos = seg(0xDA, bytes([1]) + bytes((1, 0x00)) + bytes((0, 63, 0)))
    return b"\xff\xd8" + dqt + sof0 + dht_dc + dht_ac + sos + scan + b"\xff\xd9"


# --- JPEG PIXEL layer: dequant + fixed-point integer IDCT -------------------
#
# The final decode stage (VERDICT r7 ask #3): entropy-decoded
# coefficients → dequantization (the file's own DQT, zigzag order) →
# an exact table-driven fixed-point 2-D inverse DCT → +128 level
# shift → [0,255] clamp. No float IDCT, no library: the basis
# products cos((2x+1)uπ/16)·cos((2y+1)vπ/16)·C(u)C(v)/4 are
# pre-scaled to 16-bit fixed point and the accumulator rounds ONCE at
# the end (a table IDCT, the shape embedded decoders use) — so every
# pixel is a deterministic integer function of the coefficients, and
# the DuckDB oracle replays the identical arithmetic from the planted
# coefficients + the same table. As of r9 the progressive entropy
# variants decode too; the remaining library boundary is only
# arithmetic-coded JPEG.


def _zigzag_order() -> list[tuple[int, int]]:
    """Zigzag index -> (u, v) natural position (T.81 Figure A.6):
    anti-diagonals, even diagonals walked bottom-up."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()
        order.extend(diag)
    return order


_ZIGZAG = _zigzag_order()
_IDCT_S = 16  # fixed-point fraction bits
_IDCT_HALF = 1 << (_IDCT_S - 1)


def _idct_table() -> list[list[int]]:
    """TAB[zz][8*x + y] = round(2^S · C(u)C(v)/4 ·
    cos((2x+1)uπ/16) · cos((2y+1)vπ/16)) for (u,v) = zigzag[zz].

    Computed once at import from libm cos at the 8 fixed angles; the
    round() is ~9 orders of magnitude away from any half-integer at
    these irrational cos products, so the table is stable across any
    IEEE-754 libm (and oracle SQL is generated from THIS table in the
    same process anyway)."""
    import math

    tab = []
    for u, v in _ZIGZAG:
        cu = 1 / math.sqrt(2) if u == 0 else 1.0
        cv = 1 / math.sqrt(2) if v == 0 else 1.0
        row = [
            round(
                (1 << _IDCT_S) * 0.25 * cu * cv
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * math.cos((2 * y + 1) * v * math.pi / 16)
            )
            for x in range(8)
            for y in range(8)
        ]
        tab.append(row)
    return tab


_IDCT_TAB = _idct_table()


def _idct_block_raw(zz_coeffs: list[int], quant: list[int]) -> list[int]:
    """64 UNCLAMPED level-shifted values from one block's
    zigzag-ordered coefficients: 128 + ((Σ_zz F[zz]·Q[zz]·TAB[zz][p]
    + 2^(S-1)) >> S). Single final rounding — exactly the arithmetic
    the oracle replays."""
    nz = [(zz, c * quant[zz]) for zz, c in enumerate(zz_coeffs) if c]
    out = []
    for p in range(64):
        acc = 0
        for zz, cq in nz:
            acc += cq * _IDCT_TAB[zz][p]
        out.append(128 + ((acc + _IDCT_HALF) >> _IDCT_S))
    return out


def idct_block_int(zz_coeffs: list[int], quant: list[int]) -> list[int]:
    """The clamped [0,255] pixel block (the public decode kernel)."""
    return [
        0 if raw < 0 else 255 if raw > 255 else raw
        for raw in _idct_block_raw(zz_coeffs, quant)
    ]


def parse_jpeg_pixels(blob: bytes) -> dict:
    """Full baseline decode to pixels: marker walk (DQT in zigzag
    order, DHT, SOF0 dims), per-block entropy decode into the full
    64-coefficient vector, dequant, integer IDCT, level shift, clamp —
    and exact pixel stats (n_clipped counts values the clamp moved)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("missing SOI")
    pos, w, h = 2, 0, 0
    quant: list[int] | None = None
    tables: dict[int, dict] = {}
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        length = struct.unpack_from(">H", blob, pos + 2)[0]
        body = blob[pos + 4 : pos + 2 + length]
        if marker == 0xC0:
            h, w = struct.unpack_from(">HH", body, 1)
        elif marker == 0xDB:
            if body[0] & 0xF0:
                raise ValueError("only 8-bit quant tables supported")
            quant = list(body[1:65])
        elif marker == 0xC4:
            tc_th = body[0]
            bits = list(body[1:17])
            vals = list(body[17 : 17 + sum(bits)])
            tables[tc_th] = {
                (c, ln): sym for sym, (c, ln) in _huff_codes(bits, vals).items()
            }
        pos += 2 + length
        if marker == 0xDA:
            break
    else:
        raise ValueError("missing SOS")
    end = pos
    while end + 1 < len(blob) and not (
        blob[end] == 0xFF and blob[end + 1] != 0x00
    ):
        end += 1
    if blob[end : end + 2] != b"\xff\xd9":
        raise ValueError("scan not terminated by EOI")
    if w % 8 or h % 8 or quant is None or 0x00 not in tables or 0x10 not in tables:
        raise ValueError("unsupported frame")
    n_blocks = (w // 8) * (h // 8)

    r = _BitReader(blob[pos:end])
    prev_dc = 0
    sum_pix = n_clip = 0
    mn, mx = 255, 0
    for _ in range(n_blocks):
        coeffs = [0] * 64
        s = r.read_symbol(tables[0x00])
        if s:
            bits = r.read(s)
            diff = bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1
        else:
            diff = 0
        prev_dc += diff
        coeffs[0] = prev_dc
        zz = 0
        while zz < 63:
            sym = r.read_symbol(tables[0x10])
            if sym == 0x00:
                break
            if sym == 0xF0:
                zz += 16
                continue
            run, s = sym >> 4, sym & 0xF
            zz += run + 1
            if zz > 63:
                raise ValueError("AC index overflow")
            bits = r.read(s)
            coeffs[zz] = (
                bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1
            )
        for raw in _idct_block_raw(coeffs, quant):
            pix = 0 if raw < 0 else 255 if raw > 255 else raw
            n_clip += pix != raw
            sum_pix += pix
            if pix < mn:
                mn = pix
            if pix > mx:
                mx = pix
    return {
        "n_blocks": n_blocks,
        "n_pixels": 64 * n_blocks,
        "sum_pixels": sum_pix,
        "min_pixel": mn,
        "max_pixel": mx,
        "n_clipped": n_clip,
    }


def parse_jpeg_entropy(blob: bytes) -> dict:
    """Real baseline entropy decode: huffman tables come from the
    file's DHT segments (not shared constants), dimensions from SOF0,
    then every block's DC (predicted) and AC (run/size) coefficients
    are decoded from the bit stream."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("missing SOI")
    pos, w, h = 2, 0, 0
    tables: dict[int, dict] = {}
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        length = struct.unpack_from(">H", blob, pos + 2)[0]
        body = blob[pos + 4 : pos + 2 + length]
        if marker == 0xC0:
            h, w = struct.unpack_from(">HH", body, 1)
        elif marker == 0xC4:
            tc_th = body[0]
            bits = list(body[1:17])
            vals = list(body[17 : 17 + sum(bits)])
            tables[tc_th] = {
                (c, ln): sym for sym, (c, ln) in _huff_codes(bits, vals).items()
            }
        pos += 2 + length
        if marker == 0xDA:
            break
    else:
        raise ValueError("missing SOS")
    end = pos
    while end + 1 < len(blob) and not (
        blob[end] == 0xFF and blob[end + 1] != 0x00
    ):
        end += 1
    if blob[end : end + 2] != b"\xff\xd9":
        raise ValueError("scan not terminated by EOI")
    if w % 8 or h % 8 or 0x00 not in tables or 0x10 not in tables:
        raise ValueError("unsupported frame")
    n_blocks = (w // 8) * (h // 8)

    r = _BitReader(blob[pos:end])
    prev_dc = sum_dc = n_ac = sum_ac_abs = 0
    for _ in range(n_blocks):
        s = r.read_symbol(tables[0x00])
        if s:
            bits = r.read(s)
            diff = bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1
        else:
            diff = 0
        prev_dc += diff
        sum_dc += prev_dc
        zz = 0
        while zz < 63:
            sym = r.read_symbol(tables[0x10])
            if sym == 0x00:
                break
            if sym == 0xF0:
                zz += 16
                continue
            run, s = sym >> 4, sym & 0xF
            zz += run + 1
            if zz > 63:
                raise ValueError("AC index overflow")
            bits = r.read(s)
            v = bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1
            n_ac += 1
            sum_ac_abs += abs(v)
    return {
        "n_blocks": n_blocks,
        "sum_dc": sum_dc,
        "n_nonzero_ac": n_ac,
        "sum_ac_abs": sum_ac_abs,
    }


# --- staging + kernels + declared queries -----------------------------------

def container_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "container_corpus", "documents")


def stage_container_corpus(spark: SparkSession, sf_dir: str) -> str:
    """One MP4 + one MP3 + one JPEG per media_id, staged once
    (fingerprint contract — separate table from media_corpus so the
    existing _SUCCESS marker can't mask these rows)."""
    path = container_corpus_path(sf_dir)
    if is_staged(path):
        return path
    n_docs = load_table(spark, sf_dir, "documents").count()
    n = min(CONTAINER_N, n_docs)
    rows = [(i, "video/mp4", synth_mp4(i)) for i in range(n)]
    rows += [(i, "audio/mpeg", synth_mp3(i)) for i in range(n)]
    rows += [(i, "image/jpeg", synth_jpeg(i)) for i in range(n)]
    spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    ).repartition(stage_width(len(rows))).write.mode("overwrite").parquet(path)
    return path


from .arrow_kernel import kernel_over as _kernel_over  # shared (ADVICE r7)


def mp4_box_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse every staged MP4's box tree; duration_ms is exact
    integer arithmetic (ticks·1000 div timescale)."""
    media = spark.read.parquet(stage_container_corpus(spark, sf_dir))
    kernel, schema = _kernel_over(
        lambda b: {
            **(d := parse_mp4(b)),
            "duration_ms": d["duration_ticks"] * 1000 // d["timescale"],
        },
        {
            "n_boxes": "int",
            "timescale": "int",
            "duration_ticks": "bigint",
            "n_samples": "bigint",
            "sum_sample_bytes": "bigint",
            "max_sample_bytes": "int",
            "duration_ms": "bigint",
        },
    )
    return media.where(F.col("mime") == "video/mp4").mapInPandas(
        kernel, schema=schema
    )


def mp3_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = spark.read.parquet(stage_container_corpus(spark, sf_dir))
    kernel, schema = _kernel_over(
        parse_mp3,
        {
            "n_frames": "bigint",
            "total_bytes": "bigint",
            "sum_bitrate_kbps": "bigint",
            "duration_ms": "bigint",
        },
    )
    return media.where(F.col("mime") == "audio/mpeg").mapInPandas(
        kernel, schema=schema
    )


def jpeg_marker_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = spark.read.parquet(stage_container_corpus(spark, sf_dir))
    kernel, schema = _kernel_over(
        parse_jpeg,
        {
            "width": "int",
            "height": "int",
            "n_components": "int",
            "n_markers": "int",
            "entropy_bytes": "bigint",
        },
    )
    return media.where(F.col("mime") == "image/jpeg").mapInPandas(
        kernel, schema=schema
    )


# --- closed-form oracles ----------------------------------------------------

def _staged_rel(sf_dir: str) -> str:
    from ..session import active_or_local

    path = stage_container_corpus(active_or_local("container_oracle"), sf_dir)
    return f"read_parquet('{path}/*.parquet')"


def mp4_oracle(sf_dir: str) -> str:
    rel = _staged_rel(sf_dir)
    max_n = 10 + 40  # n_samples upper bound for the range() join
    return f"""
WITH m AS (SELECT media_id FROM {rel} WHERE mime = 'video/mp4'),
p AS (SELECT media_id,
             600 + 100 * (media_id % 5) AS ts,
             10 + media_id % 41 AS n,
             100 + media_id % 156 AS delta
      FROM m),
sz AS (
  SELECT p.media_id,
         SUM(50 + (13 * p.media_id + 7 * i.range) % 101) AS sum_sz,
         MAX(50 + (13 * p.media_id + 7 * i.range) % 101) AS max_sz
  FROM p, range({max_n}) i WHERE i.range < p.n
  GROUP BY p.media_id
)
SELECT p.media_id,
       CAST({MP4_N_BOXES} AS INT) AS n_boxes,
       CAST(p.ts AS INT) AS timescale,
       CAST(p.n * p.delta AS BIGINT) AS duration_ticks,
       CAST(p.n AS BIGINT) AS n_samples,
       CAST(sz.sum_sz AS BIGINT) AS sum_sample_bytes,
       CAST(sz.max_sz AS INT) AS max_sample_bytes,
       CAST((p.n * p.delta * 1000) // p.ts AS BIGINT) AS duration_ms
FROM p JOIN sz ON p.media_id = sz.media_id
"""


def mp3_oracle(sf_dir: str) -> str:
    rel = _staged_rel(sf_dir)
    br_list = "[" + ", ".join(str(b) for b in MP3_BITRATES) + "]"
    max_n = 8 + 24
    return f"""
WITH m AS (SELECT media_id FROM {rel} WHERE mime = 'audio/mpeg'),
p AS (SELECT media_id, 8 + media_id % 25 AS n FROM m),
fr AS (
  SELECT p.media_id, p.n,
         list_extract({br_list}, 1 + (p.media_id + i.range) % 5) AS br,
         (p.media_id + i.range) % 2 AS pad
  FROM p, range({max_n}) i WHERE i.range < p.n
)
SELECT media_id,
       CAST(n AS BIGINT) AS n_frames,
       CAST(SUM(144000 * br // {MP3_SAMPLERATE} + pad) AS BIGINT) AS total_bytes,
       CAST(SUM(br) AS BIGINT) AS sum_bitrate_kbps,
       CAST(n * {MP3_SAMPLES_PER_FRAME} * 1000 // {MP3_SAMPLERATE} AS BIGINT)
         AS duration_ms
FROM fr GROUP BY media_id, n
"""


def jpeg_entropy_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "jpeg_entropy_corpus", "documents")


def stage_jpeg_entropy_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Separate staged table (fingerprint contract: appending a new
    mime to container_corpus would be masked by its _SUCCESS)."""
    path = jpeg_entropy_corpus_path(sf_dir)
    if is_staged(path):
        return path
    n_docs = load_table(spark, sf_dir, "documents").count()
    n = min(CONTAINER_N, n_docs)
    rows = [(i, "image/jpeg", synth_jpeg_baseline(i)) for i in range(n)]
    spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    ).repartition(stage_width(len(rows))).write.mode("overwrite").parquet(path)
    return path


def jpeg_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huffman-decode every staged baseline JPEG's scan data (tables
    from the file's own DHT) and report exact integer coefficient
    stats — (real entropy decode) vs (closed-form planted
    coefficients)."""
    media = spark.read.parquet(stage_jpeg_entropy_corpus(spark, sf_dir))
    kernel, schema = _kernel_over(
        parse_jpeg_entropy,
        {
            "n_blocks": "int",
            "sum_dc": "bigint",
            "n_nonzero_ac": "bigint",
            "sum_ac_abs": "bigint",
        },
    )
    return media.where(F.col("mime") == "image/jpeg").mapInPandas(
        kernel, schema=schema
    )


def jpeg_entropy_oracle(sf_dir: str) -> str:
    from ..session import active_or_local

    path = stage_jpeg_entropy_corpus(active_or_local("container_oracle"), sf_dir)
    max_nb = 4 * 3
    return f"""
WITH m AS (SELECT media_id FROM read_parquet('{path}/*.parquet')
           WHERE mime = 'image/jpeg'),
p AS (SELECT media_id, (1 + media_id % 4) * (1 + media_id % 3) AS nb FROM m),
c AS (
  SELECT p.media_id, p.nb,
         ((p.media_id * 5 + b.range * 3) % 201) - 100 AS dc,
         1 + (p.media_id + b.range) % 15 AS v1_abs,
         1 + (p.media_id + 3 * b.range) % 7 AS v2_abs
  FROM p, range({max_nb}) b WHERE b.range < p.nb
)
SELECT media_id,
       CAST(nb AS INT) AS n_blocks,
       CAST(SUM(dc) AS BIGINT) AS sum_dc,
       CAST(2 * nb AS BIGINT) AS n_nonzero_ac,
       CAST(SUM(v1_abs + v2_abs) AS BIGINT) AS sum_ac_abs
FROM c GROUP BY media_id, nb
"""


def _pixel_quant(m: int) -> list[int]:
    """The pixel corpus's REAL quant table (zigzag order): a wide DC
    step so the ±100 planted DC swings ±300 levels around 128 (both
    clamp branches fire), AC steps 1..8."""
    return [8 + m % 17] + [1 + (m + zz) % 8 for zz in range(1, 64)]


def jpeg_pixel_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "jpeg_pixel_corpus", "documents")


def stage_jpeg_pixel_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Separate staged table (fingerprint contract): the same planted
    coefficients as the entropy corpus, but with a real (non-unit)
    quant table so dequantization is exercised end to end."""
    path = jpeg_pixel_corpus_path(sf_dir)
    if is_staged(path):
        return path
    n_docs = load_table(spark, sf_dir, "documents").count()
    n = min(CONTAINER_N, n_docs)
    rows = [
        (i, "image/jpeg", synth_jpeg_baseline(i, quant=_pixel_quant(i)))
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    ).repartition(stage_width(len(rows))).write.mode("overwrite").parquet(path)
    return path


def jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG decoded to PIXELS (huffman → dequant → integer
    IDCT → level shift → clamp) with exact per-image stats; the
    oracle replays the identical fixed-point arithmetic from the
    planted coefficients and the same basis table."""
    media = spark.read.parquet(stage_jpeg_pixel_corpus(spark, sf_dir))
    kernel, schema = _kernel_over(
        parse_jpeg_pixels,
        {
            "n_blocks": "int",
            "n_pixels": "bigint",
            "sum_pixels": "bigint",
            "min_pixel": "int",
            "max_pixel": "int",
            "n_clipped": "bigint",
        },
    )
    return media.where(F.col("mime") == "image/jpeg").mapInPandas(
        kernel, schema=schema
    )


# --- PROGRESSIVE JPEG, DC scan (the thumbnail path) -------------------------
#
# Progressive files (SOF2) deliver coefficients across multiple scans;
# the FIRST scan carries every block's DC and is exactly what a
# 100 TB thumbnail/preview pipeline decodes — stop after scan 1 and
# each 8×8 block renders flat at its DC level (1/8-scale preview)
# without touching the AC refinement scans. DC coding in that scan is
# the baseline DC algorithm (T.81 §G.1.1, Ah=0), so this reuses the
# huffman/bit-reader machinery. (r9: the full-progressive and
# successive-approximation parsers below decode those scans too —
# this DC-preview parser stays as the cheap thumbnail path.)


def synth_jpeg_progressive_dc(media_id: int) -> bytes:
    """A DC-only progressive JPEG: SOF2, the quant table from
    `_pixel_quant`, the DC huffman table, one SOS with spectral
    selection Ss=Se=0 and Ah=Al=0 (a complete DC scan), then EOI —
    legal progressive framing whose never-sent AC coefficients decode
    as zero (the standard preview truncation)."""
    bx, by = _jpeg_blocks(media_id)
    dc_codes = _huff_codes(_JDC_BITS, _JDC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for b in range(bx * by):
        dc, _acs = _jpeg_coeffs(media_id, b)
        diff, prev_dc = dc - prev_dc, dc
        s = _jpeg_cat(diff)
        code, ln = dc_codes[s]
        w.write(code, ln)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    scan = w.done()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", 2 + len(payload)) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes(_pixel_quant(media_id)))
    sof2 = seg(
        0xC2,
        bytes([8])
        + struct.pack(">HH", 8 * by, 8 * bx)
        + bytes([1])
        + bytes((1, 0x11, 0)),
    )
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(_JDC_BITS) + bytes(_JDC_VALS))
    sos = seg(0xDA, bytes([1]) + bytes((1, 0x00)) + bytes((0, 0, 0)))
    return b"\xff\xd8" + dqt + sof2 + dht_dc + sos + scan + b"\xff\xd9"


def parse_jpeg_progressive_dc(blob: bytes) -> dict:
    """Decode the progressive DC scan to the 1/8-preview pixel stats:
    marker walk (SOF2 dims, DQT, DC DHT), scan-header validation
    (Ss=Se=0, Ah=Al=0 — AC or refinement scans raise), DC prediction
    decode, dequant by Q[0], flat-block pixel via the same fixed-point
    descale as the baseline pixel stage."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("missing SOI")
    pos, w, h = 2, 0, 0
    quant: list[int] | None = None
    tables: dict[int, dict] = {}
    progressive = False
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        length = struct.unpack_from(">H", blob, pos + 2)[0]
        body = blob[pos + 4 : pos + 2 + length]
        if marker == 0xC2:
            progressive = True
            h, w = struct.unpack_from(">HH", body, 1)
        elif marker == 0xC0:
            raise ValueError("baseline frame in progressive parser")
        elif marker == 0xDB:
            if body[0] & 0xF0:
                raise ValueError("only 8-bit quant tables supported")
            quant = list(body[1:65])
        elif marker == 0xC4:
            tc_th = body[0]
            bits = list(body[1:17])
            vals = list(body[17 : 17 + sum(bits)])
            tables[tc_th] = {
                (c, ln): sym for sym, (c, ln) in _huff_codes(bits, vals).items()
            }
        pos += 2 + length
        if marker == 0xDA:
            ss, se, a = body[-3], body[-2], body[-1]
            if (ss, se) != (0, 0):
                raise ValueError("AC spectral-selection scan unsupported")
            if a != 0:
                raise ValueError("successive-approximation scan unsupported")
            break
    else:
        raise ValueError("missing SOS")
    end = pos
    while end + 1 < len(blob) and not (
        blob[end] == 0xFF and blob[end + 1] != 0x00
    ):
        end += 1
    if blob[end : end + 2] != b"\xff\xd9":
        raise ValueError("scan not terminated by EOI")
    if not progressive or w % 8 or h % 8 or quant is None or 0x00 not in tables:
        raise ValueError("unsupported frame")
    n_blocks = (w // 8) * (h // 8)
    q0 = quant[0]
    t0 = _IDCT_TAB[0][0]

    r = _BitReader(blob[pos:end])
    prev_dc = 0
    sum_pix = n_clip = 0
    mn, mx = 255, 0
    for _ in range(n_blocks):
        s = r.read_symbol(tables[0x00])
        if s:
            bits = r.read(s)
            diff = bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1
        else:
            diff = 0
        prev_dc += diff
        raw = 128 + ((prev_dc * q0 * t0 + _IDCT_HALF) >> _IDCT_S)
        pix = 0 if raw < 0 else 255 if raw > 255 else raw
        n_clip += 64 * (pix != raw)
        sum_pix += 64 * pix
        mn, mx = min(mn, pix), max(mx, pix)
    return {
        "n_blocks": n_blocks,
        "n_pixels": 64 * n_blocks,
        "sum_pixels": sum_pix,
        "min_pixel": mn,
        "max_pixel": mx,
        "n_clipped": n_clip,
    }


def jpeg_prog_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "jpeg_prog_corpus", "documents")


def stage_jpeg_prog_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Separate staged table (fingerprint contract)."""
    path = jpeg_prog_corpus_path(sf_dir)
    if is_staged(path):
        return path
    n_docs = load_table(spark, sf_dir, "documents").count()
    n = min(CONTAINER_N, n_docs)
    rows = [
        (i, "image/jpeg", synth_jpeg_progressive_dc(i)) for i in range(n)
    ]
    spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    ).repartition(stage_width(len(rows))).write.mode("overwrite").parquet(path)
    return path


def jpeg_progressive_dc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive-JPEG DC-scan preview decode (thumbnail pipeline
    stats), hash-gated against the closed-form flat-block replay."""
    media = spark.read.parquet(stage_jpeg_prog_corpus(spark, sf_dir))
    kernel, schema = _kernel_over(
        parse_jpeg_progressive_dc,
        {
            "n_blocks": "int",
            "n_pixels": "bigint",
            "sum_pixels": "bigint",
            "min_pixel": "int",
            "max_pixel": "int",
            "n_clipped": "bigint",
        },
    )
    return media.where(F.col("mime") == "image/jpeg").mapInPandas(
        kernel, schema=schema
    )


def jpeg_progressive_dc_oracle(sf_dir: str) -> str:
    """Closed form: planted DC per block, q0 from `_pixel_quant`'s
    DC slot (8 + m % 17), flat-block pixel = clamp(128 +
    floor((dc·q0·T0 + 2^(S−1)) / 2^S)) with T0 = the DC basis entry —
    the same fixed-point arithmetic, replayed."""
    from ..session import active_or_local

    path = stage_jpeg_prog_corpus(active_or_local("container_oracle"), sf_dir)
    t0, half, scale = _IDCT_TAB[0][0], _IDCT_HALF, 1 << _IDCT_S
    return f"""
WITH m AS (SELECT media_id FROM read_parquet('{path}/*.parquet')
           WHERE mime = 'image/jpeg'),
par AS (SELECT media_id, (1 + media_id % 4) * (1 + media_id % 3) AS nb FROM m),
blk AS (
  SELECT par.media_id, par.nb,
         128 + CAST(FLOOR((
             (((par.media_id * 5 + b.range * 3) % 201) - 100)
             * (8 + par.media_id % 17) * {t0} + {half}) / {scale}.0) AS INT)
           AS raw
  FROM par, range(12) b WHERE b.range < par.nb
),
val AS (SELECT media_id, nb, raw, LEAST(255, GREATEST(0, raw)) AS pix
        FROM blk)
SELECT media_id,
       CAST(nb AS INT) AS n_blocks,
       CAST(64 * nb AS BIGINT) AS n_pixels,
       CAST(64 * SUM(pix) AS BIGINT) AS sum_pixels,
       CAST(MIN(pix) AS INT) AS min_pixel,
       CAST(MAX(pix) AS INT) AS max_pixel,
       CAST(64 * SUM(CASE WHEN raw <> pix THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped
FROM val GROUP BY media_id, nb
"""


def jpeg_pixel_oracle(sf_dir: str) -> str:
    """Closed-form pixel replay: planted (dc, v1@p1, v2@p2) per block,
    quant steps from `_pixel_quant`'s formula, and the SAME fixed-point
    basis table embedded as a VALUES relation — acc summed per pixel,
    one floor-rounded descale, clamp, aggregate. Every reported number
    (including n_clipped) is recomputed from first principles."""
    from ..session import active_or_local

    path = stage_jpeg_pixel_corpus(active_or_local("container_oracle"), sf_dir)
    return _pixel_replay_sql(path)


def _pixel_replay_sql(path: str, extra_cols: str = "") -> str:
    """The shared closed-form pixel replay over a staged corpus whose
    files plant `_jpeg_coeffs` + `_pixel_quant` (baseline AND full
    progressive synthesize the same coefficients, so one replay gates
    both decoders). ``extra_cols`` appends literal columns to the
    final SELECT (the progressive twin reports n_scans)."""
    # basis rows only for positions the corpus can plant: DC, p1 in
    # 1..5, p2 in 10..29
    zzs = [0] + list(range(1, 6)) + list(range(10, 30))
    tab_rows = ",".join(
        f"({zz},{p},{_IDCT_TAB[zz][p]})" for zz in zzs for p in range(64)
    )
    half, scale = _IDCT_HALF, 1 << _IDCT_S
    return f"""
WITH m AS (SELECT media_id FROM read_parquet('{path}/*.parquet')
           WHERE mime = 'image/jpeg'),
tab(zz, p, t) AS (VALUES {tab_rows}),
par AS (SELECT media_id, (1 + media_id % 4) * (1 + media_id % 3) AS nb FROM m),
blk AS (
  SELECT par.media_id, par.nb,
         ((par.media_id * 5 + b.range * 3) % 201) - 100 AS dc,
         1 + b.range % 5 AS p1,
         1 + (par.media_id + b.range) % 15 AS v1,
         10 + par.media_id % 20 AS p2,
         -(1 + (par.media_id + 3 * b.range) % 7) AS v2,
         8 + par.media_id % 17 AS q0
  FROM par, range(12) b WHERE b.range < par.nb
),
px AS (
  SELECT blk.media_id, blk.nb,
         128 + CAST(FLOOR((
             blk.dc * blk.q0 * t0.t
           + blk.v1 * (1 + (blk.media_id + blk.p1) % 8) * t1.t
           + blk.v2 * (1 + (blk.media_id + blk.p2) % 8) * t2.t
           + {half}) / {scale}.0) AS INT) AS raw
  FROM blk
  JOIN tab t0 ON t0.zz = 0
  JOIN tab t1 ON t1.zz = blk.p1 AND t1.p = t0.p
  JOIN tab t2 ON t2.zz = blk.p2 AND t2.p = t0.p
),
val AS (
  SELECT media_id, nb, raw,
         LEAST(255, GREATEST(0, raw)) AS pix
  FROM px
)
SELECT media_id,
       CAST(nb AS INT) AS n_blocks,
       CAST(64 * nb AS BIGINT) AS n_pixels,
       CAST(SUM(pix) AS BIGINT) AS sum_pixels,
       CAST(MIN(pix) AS INT) AS min_pixel,
       CAST(MAX(pix) AS INT) AS max_pixel,
       CAST(SUM(CASE WHEN raw <> pix THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped{extra_cols}
FROM val GROUP BY media_id, nb
"""


def jpeg_oracle(sf_dir: str) -> str:
    rel = _staged_rel(sf_dir)
    return f"""
SELECT media_id,
       CAST(8 * (1 + media_id % 16) AS INT) AS width,
       CAST(8 * (1 + media_id % 8) AS INT) AS height,
       CAST(3 AS INT) AS n_components,
       CAST({JPEG_N_MARKERS} AS INT) AS n_markers,
       CAST(20 + media_id % 50 AS BIGINT) AS entropy_bytes
FROM {rel} WHERE mime = 'image/jpeg'
"""


# --- PROGRESSIVE JPEG, full spectral-selection decode -----------------------
#
# The complete progressive pixel stage (closing the r7/r8 "only
# entropy-progressive variants remain" boundary for the Ah=0 case):
# a DC scan plus spectral-selection AC scans (T.81 §G.1.2.2) decoded
# across multiple SOS segments into per-block coefficient state, then
# the SAME dequant + integer-IDCT pixel stage as baseline. The AC
# scans use real progressive coding — EOBn end-of-band RUN codes
# (symbol RRRR<<4 | 0, run length 2^RRRR + RRRR appended bits) that
# span blocks — which baseline JPEG does not have; the synthesizer
# emits both the per-block flush (EOB0) and a genuine multi-block
# EOBn (the final scan's band is all-zero for every block, so it
# compresses to ONE code for the whole image). The remaining
# undeclared boundary shrinks to successive-approximation (Ah>0)
# refinement and arithmetic-coded entropy variants.

# Progressive AC huffman table: baseline's run/size family PLUS the
# EOBn family (0x00..0xE0). Kraft sum 16/32 + 64/256 = 0.75 < 1.
_JPAC_BITS = [0] * 16
_JPAC_BITS[4] = 16  # EOB0..EOB14, ZRL at length 5
_JPAC_BITS[7] = 64  # (run 0..15 × size 1..4) at length 8
_JPAC_VALS = [r << 4 for r in range(15)] + [0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 5)
]

# The two AC scans: band 1..29 covers every planted coefficient
# (p1 ∈ 1..5, p2 ∈ 10..29); band 30..63 is all-zero by construction.
_PROG_BANDS = ((1, 29), (30, 63))


def synth_jpeg_progressive_full(
    media_id: int, blocks: list[list[int]] | None = None
) -> bytes:
    """A fully-decodable progressive JPEG planting the SAME
    coefficients and quant table as the baseline pixel corpus: SOF2,
    scan 1 = complete DC (Ss=Se=0), scans 2..3 = spectral-selection
    AC bands with EOB-run coding, all with Ah=Al=0. ``blocks``
    overrides the plant with explicit 64-coefficient vectors (the
    property-test hook; AC magnitudes ≤ 15)."""
    bx, by = _jpeg_blocks(media_id)
    n_blocks = bx * by
    if blocks is None:
        blocks = []
        for b in range(n_blocks):
            dc, acs = _jpeg_coeffs(media_id, b)
            coeffs = [0] * 64
            coeffs[0] = dc
            for p, v in acs:
                coeffs[p] = v
            blocks.append(coeffs)
    elif len(blocks) != n_blocks:
        raise ValueError(f"need {n_blocks} blocks for media_id {media_id}")
    dc_codes = _huff_codes(_JDC_BITS, _JDC_VALS)
    ac_codes = _huff_codes(_JPAC_BITS, _JPAC_VALS)

    # scan 1: DC, baseline prediction coding (T.81 §G.1.1, Ah=0)
    w = _BitWriter()
    prev_dc = 0
    for coeffs in blocks:
        diff, prev_dc = coeffs[0] - prev_dc, coeffs[0]
        s = _jpeg_cat(diff)
        code, ln = dc_codes[s]
        w.write(code, ln)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    scans = [w.done()]

    # AC scans: in-band run/size coding with cross-block EOB runs —
    # exactly `_enc_ac_first` at point transform 0
    for ss, se in _PROG_BANDS:
        w = _BitWriter()
        _enc_ac_first(w, blocks, ss, se, 0, ac_codes)
        scans.append(w.done())

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", 2 + len(payload)) + payload

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(_pixel_quant(media_id)))
    out += seg(
        0xC2,
        bytes([8])
        + struct.pack(">HH", 8 * by, 8 * bx)
        + bytes([1])
        + bytes((1, 0x11, 0)),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(_JDC_BITS) + bytes(_JDC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_JPAC_BITS) + bytes(_JPAC_VALS))
    out += seg(0xDA, bytes([1]) + bytes((1, 0x00)) + bytes((0, 0, 0))) + scans[0]
    for (ss, se), scan in zip(_PROG_BANDS, scans[1:]):
        out += seg(0xDA, bytes([1]) + bytes((1, 0x00)) + bytes((ss, se, 0))) + scan
    return out + b"\xff\xd9"


# Successive-approximation scan script (T.81 §G.1.1.2 / §G.1.2.3):
# first scans send the point-transformed values (>> Al), refinement
# scans send one magnitude bit per coefficient position — newly-
# significant AC coefficients as (run, 1)+sign codes over zero-
# history runs, everything already nonzero as raw correction bits
# (buffered across EOB runs). The script below interleaves DC and AC
# refinement the way real encoders emit them.
_SA_SCRIPT = (
    # (ss, se, ah, al)
    (0, 0, 0, 1),  # DC first, Al=1
    (1, 29, 0, 1),  # AC first over the planted band, Al=1
    (0, 0, 1, 0),  # DC refinement: bit 0
    (1, 29, 1, 0),  # AC refinement: bit 0 (newly-significant ±1s)
    (30, 63, 0, 0),  # empty tail band: one multi-block EOBn
)


def _enc_ac_first(
    w: "_BitWriter",
    blocks: list[list[int]],
    ss: int,
    se: int,
    al: int,
    ac_codes: dict,
) -> None:
    """First AC scan at point transform ``al`` — band run/size coding
    of sign(v)·(|v| >> al) with cross-block EOB runs."""
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            rr = eobrun.bit_length() - 1
            code, ln = ac_codes[rr << 4]
            w.write(code, ln)
            if rr:
                w.write(eobrun - (1 << rr), rr)
            eobrun = 0

    for coeffs in blocks:
        band = [
            (k, (abs(coeffs[k]) >> al) * (1 if coeffs[k] >= 0 else -1))
            for k in range(ss, se + 1)
        ]
        nz = [(k, t) for k, t in band if t]
        if not nz:
            eobrun += 1
            continue
        flush()
        pos = ss - 1
        for k, t in nz:
            run = k - pos - 1
            while run >= 16:
                code, ln = ac_codes[0xF0]
                w.write(code, ln)
                run -= 16
            s = _jpeg_cat(t)
            code, ln = ac_codes[(run << 4) | s]
            w.write(code, ln)
            w.write(t if t >= 0 else t + (1 << s) - 1, s)
            pos = k
        if pos < se:
            eobrun += 1
    flush()


def _enc_ac_refine(
    w: "_BitWriter",
    blocks: list[list[int]],
    ss: int,
    se: int,
    al: int,
    ac_codes: dict,
) -> None:
    """AC refinement scan (Ah = al + 1): the correction-bit algorithm
    as a SIMULATION OF THE DECODER'S WALK (§G.1.2.3) — each emitted
    symbol carries exactly the correction bits the decoder consumes
    while advancing for THAT symbol. (A first draft buffered all
    corrections since the previous symbol and flushed them at the
    next one; the property test over random blocks falsified it the
    day it was written: corrections belonging to positions AFTER a
    ZRL's 16-zero segment must ride the NEXT symbol, not the ZRL.)
    Cross-block EOB runs buffer the absorbed blocks' tail corrections
    and emit them after the EOBn code, in block order."""
    eobrun = 0
    be_bits: list[int] = []

    def flush() -> None:
        nonlocal eobrun, be_bits
        if eobrun:
            rr = eobrun.bit_length() - 1
            code, ln = ac_codes[rr << 4]
            w.write(code, ln)
            if rr:
                w.write(eobrun - (1 << rr), rr)
            for b in be_bits:
                w.write(b, 1)
            be_bits = []
            eobrun = 0

    for coeffs in blocks:
        newly = [
            k for k in range(ss, se + 1) if abs(coeffs[k]) >> al == 1
        ]
        k = ss
        for p in newly:
            corr: list[int] = []
            zcount = 0
            for q in range(k, p):
                t = abs(coeffs[q]) >> al
                if t == 0:
                    zcount += 1
                    if zcount == 16:
                        # the decoder's ZRL walk stops AT the 16th
                        # zero-history slot, consuming exactly the
                        # corrections passed so far
                        flush()
                        code, ln = ac_codes[0xF0]
                        w.write(code, ln)
                        for b in corr:
                            w.write(b, 1)
                        corr = []
                        zcount = 0
                else:
                    corr.append(t & 1)
            flush()
            code, ln = ac_codes[(zcount << 4) | 1]
            w.write(code, ln)
            w.write(1 if coeffs[p] > 0 else 0, 1)
            for b in corr:
                w.write(b, 1)
            k = p + 1
        if k <= se:  # tail absorbed into the EOB run
            eobrun += 1
            for q in range(k, se + 1):
                t = abs(coeffs[q]) >> al
                if t > 1:
                    be_bits.append(t & 1)
    flush()


def synth_jpeg_progressive_sa(
    media_id: int, blocks: list[list[int]] | None = None
) -> bytes:
    """A successive-approximation progressive JPEG planting the SAME
    coefficients and quant table as the baseline pixel corpus, sent
    over the 5-scan `_SA_SCRIPT` (DC/AC first scans at Al=1, then the
    bit-0 refinement scans, then the all-zero tail band).

    ``blocks`` overrides the planted coefficients with explicit
    64-coefficient vectors (len must be the id's block count; AC
    magnitudes ≤ 15, the 4-bit size ceiling of the table) — the
    property-test hook: random blocks exercise encoder/decoder paths
    (ZRL runs, EOBn lengths, refinement corrections) the fixed plant
    never reaches."""
    bx, by = _jpeg_blocks(media_id)
    n_blocks = bx * by
    if blocks is None:
        blocks = []
        for b in range(n_blocks):
            dc, acs = _jpeg_coeffs(media_id, b)
            coeffs = [0] * 64
            coeffs[0] = dc
            for p, v in acs:
                coeffs[p] = v
            blocks.append(coeffs)
    elif len(blocks) != n_blocks:
        raise ValueError(f"need {n_blocks} blocks for media_id {media_id}")
    dc_codes = _huff_codes(_JDC_BITS, _JDC_VALS)
    ac_codes = _huff_codes(_JPAC_BITS, _JPAC_VALS)

    scans = []
    for ss, se, ah, al in _SA_SCRIPT:
        w = _BitWriter()
        if ss == 0:
            if ah == 0:  # DC first: prediction in the shifted domain
                prev = 0
                for coeffs in blocks:
                    vs = coeffs[0] >> al
                    diff, prev = vs - prev, vs
                    s = _jpeg_cat(diff)
                    code, ln = dc_codes[s]
                    w.write(code, ln)
                    if s:
                        w.write(
                            diff if diff >= 0 else diff + (1 << s) - 1, s
                        )
            else:  # DC refinement: raw bit Al (two's complement)
                for coeffs in blocks:
                    w.write((coeffs[0] >> al) & 1, 1)
        elif ah == 0:
            _enc_ac_first(w, blocks, ss, se, al, ac_codes)
        else:
            _enc_ac_refine(w, blocks, ss, se, al, ac_codes)
        scans.append(w.done())

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", 2 + len(payload)) + payload

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(_pixel_quant(media_id)))
    out += seg(
        0xC2,
        bytes([8])
        + struct.pack(">HH", 8 * by, 8 * bx)
        + bytes([1])
        + bytes((1, 0x11, 0)),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(_JDC_BITS) + bytes(_JDC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_JPAC_BITS) + bytes(_JPAC_VALS))
    for (ss, se, ah, al), scan in zip(_SA_SCRIPT, scans):
        out += seg(
            0xDA,
            bytes([1]) + bytes((1, 0x00)) + bytes((ss, se, (ah << 4) | al)),
        ) + scan
    return out + b"\xff\xd9"


def parse_jpeg_progressive_pixels(blob: bytes) -> dict:
    """Full progressive decode to pixels: multi-scan marker walk,
    per-scan entropy decode (DC prediction; AC spectral selection
    with EOBn run state per T.81 §G.1.2.2) accumulating per-block
    coefficient state, then dequant + integer IDCT + level shift +
    clamp — identical pixel arithmetic to the baseline stage.
    Successive-approximation scans ARE decoded (first pass Ah=0/Al>0
    plus refinement passes with Ah == Al+1 per T.81 §G.1.2.3 —
    ``jpeg_progressive_sa_stats`` exercises that path); the remaining
    boundaries that raise are refinement scans that skip a bit plane
    (Ah != Al+1) and arithmetic-coded entropy (SOF10)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("missing SOI")
    pos, w, h = 2, 0, 0
    quant: list[int] | None = None
    tables: dict[int, dict] = {}
    progressive = False
    coeffs: list[list[int]] | None = None
    n_scans = 0
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        if marker == 0xD9:
            pos += 2
            break
        length = struct.unpack_from(">H", blob, pos + 2)[0]
        body = blob[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xC2:
            progressive = True
            h, w = struct.unpack_from(">HH", body, 1)
            if w % 8 or h % 8 or body[5] != 1:
                raise ValueError("unsupported progressive frame")
            coeffs = [[0] * 64 for _ in range((w // 8) * (h // 8))]
        elif marker == 0xC0:
            raise ValueError("baseline frame in progressive parser")
        elif marker == 0xDB:
            if body[0] & 0xF0:
                raise ValueError("only 8-bit quant tables supported")
            quant = list(body[1:65])
        elif marker == 0xC4:
            tc_th = body[0]
            bits = list(body[1:17])
            vals = list(body[17 : 17 + sum(bits)])
            tables[tc_th] = {
                (c, ln): sym for sym, (c, ln) in _huff_codes(bits, vals).items()
            }
        elif marker == 0xDA:
            if not progressive or coeffs is None:
                raise ValueError("SOS before SOF2")
            if body[0] != 1:
                raise ValueError("multi-component scan unsupported")
            td_ta = body[2]
            ss, se, a = body[3], body[4], body[5]
            ah, al = a >> 4, a & 0x0F
            if ah != 0 and ah != al + 1:
                raise ValueError(
                    "refinement scan must lower the point transform "
                    "by exactly one bit (Ah = Al + 1)"
                )
            end = pos
            while end + 1 < len(blob) and not (
                blob[end] == 0xFF and blob[end + 1] != 0x00
            ):
                end += 1
            r = _BitReader(blob[pos:end])
            if ss == 0:
                if se != 0:
                    raise ValueError("DC scan must have Se=0")
                if ah == 0:
                    # first DC scan at point transform Al: prediction
                    # runs in the shifted domain, stored value is
                    # v << Al (two's-complement — Python's arbitrary-
                    # precision ints match the spec's bit semantics
                    # for negatives)
                    dc_map = tables.get(td_ta >> 4)
                    if dc_map is None:
                        raise ValueError("missing DC table")
                    prev_dc = 0
                    for blk in coeffs:
                        s = r.read_symbol(dc_map)
                        if s:
                            bits = r.read(s)
                            diff = (
                                bits
                                if bits >= (1 << (s - 1))
                                else bits - (1 << s) + 1
                            )
                        else:
                            diff = 0
                        prev_dc += diff
                        blk[0] = prev_dc << al
                else:
                    # DC refinement (T.81 §G.1.1.2): one raw bit per
                    # block, ORed in at position Al
                    p1 = 1 << al
                    for blk in coeffs:
                        if r.read(1):
                            blk[0] |= p1
            else:
                if not 1 <= ss <= se <= 63:
                    raise ValueError("bad spectral band")
                ac_map = tables.get(0x10 | (td_ta & 0x0F))
                if ac_map is None:
                    raise ValueError("missing AC table")
                if ah == 0:
                    # first AC scan at level Al (§G.1.2.2): run/size
                    # with EOBn; decoded magnitudes scale by << Al
                    # (AC point transform is sign-magnitude, and a
                    # left shift is sign-transparent)
                    eobrun = 0
                    for blk in coeffs:
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            sym = r.read_symbol(ac_map)
                            run, s = sym >> 4, sym & 0x0F
                            if s == 0:
                                if run == 15:  # ZRL: 16 zeros in band
                                    k += 16
                                    continue
                                eobrun = 1 << run
                                if run:
                                    eobrun += r.read(run)
                                eobrun -= 1  # current block's EOB
                                break
                            k += run
                            if k > se:
                                raise ValueError("AC index beyond band")
                            bits = r.read(s)
                            v = (
                                bits
                                if bits >= (1 << (s - 1))
                                else bits - (1 << s) + 1
                            )
                            blk[k] = v << al
                            k += 1
                    if eobrun:
                        raise ValueError("EOB run spills past final block")
                else:
                    # AC refinement (§G.1.2.3): newly-significant
                    # coefficients arrive as (run, size=1) + sign,
                    # runs count only zero-history positions, and
                    # every nonzero-history coefficient passed (or
                    # covered by an EOB run) carries one correction
                    # bit that grows its magnitude by 1 << Al
                    p1 = 1 << al
                    eobrun = 0

                    def _correct(blk: list, k: int) -> None:
                        if r.read(1):
                            blk[k] += p1 if blk[k] > 0 else -p1

                    for blk in coeffs:
                        k = ss
                        if not eobrun:
                            while k <= se:
                                sym = r.read_symbol(ac_map)
                                run, s = sym >> 4, sym & 0x0F
                                newval = 0
                                if s == 0:
                                    if run != 15:
                                        eobrun = 1 << run
                                        if run:
                                            eobrun += r.read(run)
                                        break
                                    # ZRL: skip 16 zero-history slots
                                else:
                                    if s != 1:
                                        raise ValueError(
                                            "refinement size must be 1"
                                        )
                                    newval = p1 if r.read(1) else -p1
                                while k <= se:
                                    if blk[k] != 0:
                                        _correct(blk, k)
                                    else:
                                        if run == 0:
                                            break
                                        run -= 1
                                    k += 1
                                if newval:
                                    if k > se:
                                        raise ValueError(
                                            "AC index beyond band"
                                        )
                                    blk[k] = newval
                                k += 1
                        if eobrun:
                            # rest of this block's band: correction
                            # bits only
                            while k <= se:
                                if blk[k] != 0:
                                    _correct(blk, k)
                                k += 1
                            eobrun -= 1
                    if eobrun:
                        raise ValueError("EOB run spills past final block")
            n_scans += 1
            pos = end
    else:
        raise ValueError("missing EOI")
    if coeffs is None or quant is None or n_scans == 0:
        raise ValueError("unsupported frame")
    sum_pix = n_clip = 0
    mn, mx = 255, 0
    for blk in coeffs:
        for raw in _idct_block_raw(blk, quant):
            pix = 0 if raw < 0 else 255 if raw > 255 else raw
            n_clip += pix != raw
            sum_pix += pix
            if pix < mn:
                mn = pix
            if pix > mx:
                mx = pix
    n_blocks = len(coeffs)
    return {
        "n_blocks": n_blocks,
        "n_pixels": 64 * n_blocks,
        "sum_pixels": sum_pix,
        "min_pixel": mn,
        "max_pixel": mx,
        "n_clipped": n_clip,
        "n_scans": n_scans,
    }


def jpeg_prog_full_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "jpeg_prog_full_corpus", "documents")


def stage_jpeg_prog_full_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Separate staged table (fingerprint contract)."""
    path = jpeg_prog_full_corpus_path(sf_dir)
    if is_staged(path):
        return path
    n_docs = load_table(spark, sf_dir, "documents").count()
    n = min(CONTAINER_N, n_docs)
    rows = [
        (i, "image/jpeg", synth_jpeg_progressive_full(i)) for i in range(n)
    ]
    spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    ).repartition(stage_width(len(rows))).write.mode("overwrite").parquet(path)
    return path


def jpeg_progressive_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive JPEG decoded to PIXELS across all three scans
    (DC + two spectral-selection AC bands with EOB-run codes); the
    oracle replays the identical fixed-point arithmetic from the
    planted coefficients — the same replay that gates the baseline
    decoder, because both corpora plant the same blocks."""
    media = spark.read.parquet(stage_jpeg_prog_full_corpus(spark, sf_dir))
    kernel, schema = _kernel_over(
        parse_jpeg_progressive_pixels,
        {
            "n_blocks": "int",
            "n_pixels": "bigint",
            "sum_pixels": "bigint",
            "min_pixel": "int",
            "max_pixel": "int",
            "n_clipped": "bigint",
            "n_scans": "int",
        },
    )
    return media.where(F.col("mime") == "image/jpeg").mapInPandas(
        kernel, schema=schema
    )


def jpeg_progressive_pixel_oracle(sf_dir: str) -> str:
    from ..session import active_or_local

    path = stage_jpeg_prog_full_corpus(
        active_or_local("container_oracle"), sf_dir
    )
    n_scans = 1 + len(_PROG_BANDS)
    return _pixel_replay_sql(
        path, f",\n       CAST({n_scans} AS INT) AS n_scans"
    )


def jpeg_prog_sa_corpus_path(sf_dir: str) -> str:
    return staged_path(sf_dir, "jpeg_prog_sa_corpus", "documents")


def stage_jpeg_prog_sa_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Separate staged table (fingerprint contract)."""
    path = jpeg_prog_sa_corpus_path(sf_dir)
    if is_staged(path):
        return path
    n_docs = load_table(spark, sf_dir, "documents").count()
    n = min(CONTAINER_N, n_docs)
    rows = [(i, "image/jpeg", synth_jpeg_progressive_sa(i)) for i in range(n)]
    spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    ).repartition(stage_width(len(rows))).write.mode("overwrite").parquet(path)
    return path


def jpeg_progressive_sa_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successive-approximation progressive JPEG decoded to PIXELS
    across the 5-scan script (point-transformed first scans +
    correction-bit refinement scans + the EOBn tail band); gated by
    the same closed-form pixel replay as the baseline decoder — both
    corpora plant identical coefficients, so any divergence in the
    bit-plane reconstruction is a hash mismatch. With this stage the
    undecoded JPEG boundary is arithmetic-coded entropy only."""
    media = spark.read.parquet(stage_jpeg_prog_sa_corpus(spark, sf_dir))
    kernel, schema = _kernel_over(
        parse_jpeg_progressive_pixels,
        {
            "n_blocks": "int",
            "n_pixels": "bigint",
            "sum_pixels": "bigint",
            "min_pixel": "int",
            "max_pixel": "int",
            "n_clipped": "bigint",
            "n_scans": "int",
        },
    )
    return media.where(F.col("mime") == "image/jpeg").mapInPandas(
        kernel, schema=schema
    )


def jpeg_progressive_sa_oracle(sf_dir: str) -> str:
    from ..session import active_or_local

    path = stage_jpeg_prog_sa_corpus(
        active_or_local("container_oracle"), sf_dir
    )
    return _pixel_replay_sql(
        path, f",\n       CAST({len(_SA_SCRIPT)} AS INT) AS n_scans"
    )


QUERIES: dict = {}

QUERIES_TAIL = {
    "mp4_box_stats": (mp4_box_stats, mp4_oracle),
    "mp3_frame_stats": (mp3_frame_stats, mp3_oracle),
    "jpeg_marker_stats": (jpeg_marker_stats, jpeg_oracle),
    "jpeg_entropy_stats": (jpeg_entropy_stats, jpeg_entropy_oracle),
    "jpeg_pixel_stats": (jpeg_pixel_stats, jpeg_pixel_oracle),
    "jpeg_progressive_dc_stats": (
        jpeg_progressive_dc_stats,
        jpeg_progressive_dc_oracle,
    ),
    "jpeg_progressive_pixel_stats": (
        jpeg_progressive_pixel_stats,
        jpeg_progressive_pixel_oracle,
    ),
    "jpeg_progressive_sa_stats": (
        jpeg_progressive_sa_stats,
        jpeg_progressive_sa_oracle,
    ),
}
