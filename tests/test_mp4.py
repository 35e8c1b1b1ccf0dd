"""ISO BMFF (MP4) container codec tests (codecs/mp4.py).

The reference repo has no video codecs; these pin the public-spec
behaviors of ISO/IEC 14496-12 box framing and sample-table demux:
lossless 'raw '-RGB round-trips, box-order independence, largesize and
co64 variants, multi-chunk/multi-run stsc resolution, honest codec
boundaries for compressed sample entries, and raise-never-misdecode on
malformed tables.
"""

import struct

import numpy as np
import pytest

from activity_files_spark.codecs.mp4 import (
    _box,
    _full,
    encode_mp4_raw,
    parse_mp4_meta,
    parse_mp4_raw,
)


def _frames(seed: int = 1, n: int = 5, h: int = 6, w: int = 8) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_raw_rgb_roundtrip_byte_exact():
    fr = _frames()
    out, meta = parse_mp4_raw(encode_mp4_raw(fr, fps=(10, 1)))
    assert (out == fr).all()
    assert meta["codec"] == "raw " and meta["w"] == 8 and meta["h"] == 6
    assert meta["n_samples"] == 5
    assert meta["media_timescale"] == 10 and meta["duration_ticks"] == 5


def test_single_frame_and_odd_dims():
    fr = _frames(seed=2, n=1, h=5, w=7)
    out, meta = parse_mp4_raw(encode_mp4_raw(fr, fps=(24, 1)))
    assert (out == fr).all() and meta["n_samples"] == 1


def test_sample_ranges_point_into_mdat():
    fr = _frames(seed=3, n=4)
    data = encode_mp4_raw(fr)
    meta = parse_mp4_meta(data)
    fsz = 6 * 8 * 3
    assert [s for _, s in meta["sample_ranges"]] == [fsz] * 4
    offs = [o for o, _ in meta["sample_ranges"]]
    assert offs == [offs[0] + i * fsz for i in range(4)]
    # slicing a range reproduces the frame bytes
    o, s = meta["sample_ranges"][2]
    assert data[o : o + s] == fr[2].tobytes()


def test_moov_before_mdat_parses_too():
    # the parser must not assume writer box order: swap mdat and moov
    data = encode_mp4_raw(_frames(seed=4, n=3))
    boxes = {}
    pos = 0
    while pos < len(data):
        size, fourcc = struct.unpack_from(">I4s", data, pos)
        boxes[fourcc] = data[pos : pos + size]
        pos += size
    reordered = boxes[b"ftyp"] + boxes[b"moov"] + boxes[b"mdat"]
    # stco offsets are absolute and unchanged only if mdat lands at the
    # same byte position — rebuild: keep original order but parse from a
    # prefix-shifted copy to prove offset resolution is absolute, not
    # relative to moov
    fr = _frames(seed=4, n=3)
    meta = parse_mp4_meta(reordered)
    assert meta["n_samples"] == 3  # tables parse regardless of order
    # with mdat moved the offsets are stale — decode from the ORIGINAL
    out, _ = parse_mp4_raw(data)
    assert (out == fr).all()


def test_largesize_mdat_and_co64():
    # craft a file using a 64-bit largesize mdat and a co64 offset table
    fr = _frames(seed=5, n=2)
    fsz = 6 * 8 * 3
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    mdat_body = fr.tobytes()
    mdat = struct.pack(">I4sQ", 1, b"mdat", 16 + len(mdat_body)) + mdat_body
    off = len(ftyp) + 16
    vse = (
        bytes(6) + struct.pack(">H", 1) + bytes(16)
        + struct.pack(">HH", 8, 6)
        + struct.pack(">II", 0x480000, 0x480000) + bytes(4)
        + struct.pack(">H", 1) + bytes(32) + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"raw ", vse))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, 2, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 2, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">III", fsz, 2, 0))
    co64 = _full(b"co64", 0, 0, struct.pack(">IQ", 1, off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + co64)
    minf = _box(b"minf", _full(b"vmhd", 0, 1, bytes(8)) + stbl)
    hdlr = _full(b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(12) + b"\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 30, 2) + bytes(4))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", _full(b"tkhd", 0, 7, bytes(80)) + mdia)
    moov = _box(b"moov", trak)
    out, meta = parse_mp4_raw(ftyp + mdat + moov)
    assert (out == fr).all()
    assert meta["media_timescale"] == 30


def test_multi_chunk_stsc_runs():
    # 5 samples split into chunks of (2, 2, 1) via two stsc runs
    fr = _frames(seed=6, n=5)
    fsz = 6 * 8 * 3
    data = bytearray(encode_mp4_raw(fr))
    base = parse_mp4_meta(bytes(data))
    o0 = base["sample_ranges"][0][0]
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)  # chunks 1-2: two samples each
        + struct.pack(">III", 3, 1, 1),  # chunk 3: one sample
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">IIII", 3, o0, o0 + 2 * fsz, o0 + 4 * fsz),
    )
    raw = bytes(data)
    # splice: replace the original stsc and stco bodies
    orig_stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 5, 1))
    orig_stco = _full(b"stco", 0, 0, struct.pack(">II", 1, o0))
    assert orig_stsc in raw and orig_stco in raw
    raw = raw.replace(orig_stsc + orig_stco, stsc + stco)
    out, meta = parse_mp4_raw(raw)
    assert meta["n_samples"] == 5
    assert (out == fr).all()


def test_compressed_sample_entry_is_honest_stub_with_real_metadata():
    data = bytearray(encode_mp4_raw(_frames(seed=7, n=2)))
    # the sample-entry fourcc sits 12 bytes into the stsd box payload
    # (version/flags + entry_count + entry size); don't find(b"raw ") —
    # the hdlr name "raw video" matches first
    idx = bytes(data).find(b"stsd") + 4 + 4 + 4 + 4
    assert bytes(data[idx : idx + 4]) == b"raw "
    data[idx : idx + 4] = b"avc1"
    meta = parse_mp4_meta(bytes(data))  # container metadata still parses
    assert meta["codec"] == "avc1" and meta["n_samples"] == 2
    with pytest.raises(NotImplementedError, match="avc1"):
        parse_mp4_raw(bytes(data))


def test_malformed_tables_raise_not_misdecode():
    fr = _frames(seed=8, n=3)
    data = encode_mp4_raw(fr)
    with pytest.raises(ValueError, match="no moov"):
        parse_mp4_meta(data[: data.find(b"moov") - 4])
    # truncated mdat: cut the file short but keep moov by rebuilding
    boxes = {}
    pos = 0
    while pos < len(data):
        size, fourcc = struct.unpack_from(">I4s", data, pos)
        boxes[fourcc] = data[pos : pos + size]
        pos += size
    short = boxes[b"ftyp"] + boxes[b"mdat"][: len(boxes[b"mdat"]) // 2] + boxes[b"moov"]
    # the mdat box header now lies about its size -> overrun detected
    with pytest.raises(ValueError):
        parse_mp4_meta(short)


def test_struct_level_garbage_normalized_to_valueerror():
    # a count field promising more table entries than the buffer holds
    # must surface as ValueError (raise-never-misdecode), not struct.error
    data = bytearray(encode_mp4_raw(_frames(seed=10, n=2)))
    idx = bytes(data).find(b"stsz") + 4 + 4 + 4  # into the count field
    data[idx : idx + 4] = struct.pack(">I", 1 << 30)
    with pytest.raises(ValueError, match="malformed ISO BMFF"):
        parse_mp4_meta(bytes(data))


def test_video_surface_wiring():
    from activity_files_spark.operators.multimodal import decode_video_frame

    fr = _frames(seed=9, n=4)
    data = encode_mp4_raw(fr)
    assert (decode_video_frame(data, "mp4", 8, 6, 1) == fr[1]).all()
    # a bare EBML magic with no header/segment is a malformed webm now
    # that the Matroska codec is real (compressed-codec stubbing is pinned
    # in tests/test_mkv.py against a full container)
    with pytest.raises(ValueError):
        decode_video_frame(b"\x1a\x45\xdf\xa3", "webm", 8, 6, 0)
