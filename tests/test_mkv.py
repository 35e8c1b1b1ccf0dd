"""Matroska / WebM container codec tests (codecs/mkv.py).

The reference repo has no video codecs; these pin the public-spec
behaviors of RFC 8794 EBML framing and the Matroska block layer:
lossless I420 round-trips under every lacing scheme, unknown-size
Segment/Cluster resolution, CRC-32 verification, Void/foreign-element
skip, multi-track block filtering, BlockGroup as well as SimpleBlock,
honest codec boundaries for compressed CodecIDs, and
raise-never-misdecode on malformed structures.
"""

import struct

import numpy as np
import pytest

from activity_files_spark.codecs.mkv import (
    _elem,
    _encode_signed_vint,
    _encode_vint,
    _read_signed_vint,
    _read_size,
    decode_i420_frame,
    encode_mkv,
    parse_mkv,
    parse_mkv_meta,
)


def _planes(seed: int = 1, n: int = 6, h: int = 6, w: int = 8):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2), dtype=np.uint8)
    return y, u, v


def _upsample(p: np.ndarray) -> np.ndarray:
    return np.repeat(np.repeat(p, 2, axis=1), 2, axis=2)


def _assert_planes(frames, y, u, v):
    assert (frames[..., 0] == y).all()
    assert (frames[..., 1] == _upsample(u)).all()
    assert (frames[..., 2] == _upsample(v)).all()


# --- vint primitives -----------------------------------------------------


def test_vint_roundtrip_boundaries():
    # 2^(7L)-2 is the largest value of length L (all-ones is reserved)
    for val in (0, 1, 126, 127, 128, 2**14 - 2, 2**14 - 1, 2**21 - 2,
                2**35, 2**49, 2**56 - 2):
        enc = _encode_vint(val)
        got, pos = _read_size(enc, 0)
        assert got == val and pos == len(enc)


def test_vint_all_ones_is_unknown_size():
    got, _ = _read_size(b"\xff", 0)
    assert got is None
    got, _ = _read_size(b"\x7f\xff", 0)
    assert got is None


def test_signed_vint_roundtrip():
    for val in (0, 1, -1, 63, -63, 64, -64, 8191, -8191, 2**20, -(2**20)):
        enc = _encode_signed_vint(val)
        got, pos = _read_signed_vint(enc, 0)
        assert got == val and pos == len(enc)


# --- round-trips ---------------------------------------------------------


@pytest.mark.parametrize("lacing", [None, "xiph", "fixed", "ebml"])
@pytest.mark.parametrize("doctype", ["matroska", "webm"])
def test_i420_roundtrip_all_lacings(lacing, doctype):
    y, u, v = _planes(seed=3, n=7)
    data = encode_mkv((y, u, v), fps=(10, 1), doctype=doctype,
                      frames_per_cluster=3, lacing=lacing)
    frames, meta = parse_mkv(data)
    assert frames.shape == (7, 6, 8, 3)
    _assert_planes(frames, y, u, v)
    assert meta["doctype"] == doctype
    assert meta["codec"] == "V_UNCOMPRESSED"
    assert meta["w"] == 8 and meta["h"] == 6
    assert meta["fps"] == pytest.approx(10.0)
    assert meta["n_frames"] == 7


def test_single_frame_and_single_cluster():
    y, u, v = _planes(seed=4, n=1)
    frames, _ = parse_mkv(encode_mkv((y, u, v), frames_per_cluster=8))
    _assert_planes(frames, y, u, v)


def test_frames_ordered_by_timestamp_across_clusters():
    y, u, v = _planes(seed=5, n=9)
    data = encode_mkv((y, u, v), fps=(25, 1), frames_per_cluster=2)
    frames, meta = parse_mkv(data)
    assert meta["n_frames"] == 9
    _assert_planes(frames, y, u, v)


def test_xiph_lacing_255_multiple_sizes():
    # frame payload an exact multiple of 255 exercises the 255-run + 0
    # terminator in the Xiph size table: 20x17 luma is not valid I420, so
    # craft sizes via a wider even frame whose payload = 1530 = 6*255
    y, u, v = _planes(seed=6, n=3, h=30, w=34)
    assert 30 * 34 + 2 * 15 * 17 == 1530
    data = encode_mkv((y, u, v), frames_per_cluster=3, lacing="xiph")
    frames, _ = parse_mkv(data)
    _assert_planes(frames, y, u, v)


# --- spec-robustness: reader-only shapes the writer never emits ----------


def _wrap_segment(body: bytes, doctype: bytes = b"matroska") -> bytes:
    header = _elem(0x1A45DFA3, b"".join([
        _elem(0x4286, b"\x01"), _elem(0x42F7, b"\x01"),
        _elem(0x42F2, b"\x04"), _elem(0x42F3, b"\x08"),
        _elem(0x4282, doctype), _elem(0x4287, b"\x04"),
        _elem(0x4285, b"\x02"),
    ]))
    return header + _elem(0x18538067, body)


def _tracks(codec: bytes = b"V_UNCOMPRESSED", w: int = 8, h: int = 6) -> bytes:
    return _elem(0x1654AE6B, _elem(0xAE, b"".join([
        _elem(0xD7, b"\x01"), _elem(0x73C5, b"\x01"), _elem(0x83, b"\x01"),
        _elem(0x23E383, (100_000_000).to_bytes(4, "big")),
        _elem(0x86, codec),
        _elem(0xE0, _elem(0xB0, bytes([w])) + _elem(0xBA, bytes([h]))
              + _elem(0x2EB524, b"I420")),
    ])))


def _i420_payload(seed: int, h: int = 6, w: int = 8) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, h * w + 2 * (h // 2) * (w // 2),
                        dtype=np.uint8).tobytes()


def _simple_block(payload: bytes, rel_ts: int = 0) -> bytes:
    return _elem(0xA3, _encode_vint(1) + struct.pack(">h", rel_ts) + b"\x80"
                 + payload)


def test_unknown_size_segment_and_cluster():
    p0, p1 = _i420_payload(1), _i420_payload(2)
    cluster_body = (_elem(0xE7, b"\x00") + _simple_block(p0, 0)
                    + _simple_block(p1, 4))
    # unknown-size Cluster (0x1F43B675 + 0xFF) followed by a Tags element —
    # the cluster must end exactly where Tags begins
    body = (_tracks()
            + bytes.fromhex("1F43B675") + b"\xff" + cluster_body
            + _elem(0x1254C367, b""))
    # rebuild manually: EBML header + unknown-size Segment
    ebml = _wrap_segment(b"").split(bytes.fromhex("18538067"))[0]
    data = ebml + bytes.fromhex("18538067") + b"\xff" + body
    frames, meta = parse_mkv(data)
    assert meta["n_frames"] == 2
    assert frames.shape == (2, 6, 8, 3)
    assert frames[0].tobytes() != frames[1].tobytes()


def test_block_group_blocks_decode_like_simple_blocks():
    p0 = _i420_payload(7)
    block = _elem(0xA1, _encode_vint(1) + struct.pack(">h", 0) + b"\x00" + p0)
    group = _elem(0xA0, block + _elem(0x9B, b"\x04"))
    cluster = _elem(0x1F43B675, _elem(0xE7, b"\x00") + group)
    frames, meta = parse_mkv(_wrap_segment(_tracks() + cluster))
    assert meta["n_frames"] == 1
    assert frames[0, :, :, 0].tobytes() == p0[:48]


def test_foreign_track_blocks_are_filtered():
    p0 = _i420_payload(8)
    audio_junk = _elem(0xA3, _encode_vint(2) + struct.pack(">h", 0) + b"\x80"
                       + b"\x00" * 10)
    cluster = _elem(0x1F43B675, _elem(0xE7, b"\x00") + audio_junk
                    + _simple_block(p0))
    frames, meta = parse_mkv(_wrap_segment(_tracks() + cluster))
    assert meta["n_frames"] == 1


def test_void_and_foreign_elements_skipped():
    p0 = _i420_payload(9)
    cluster = _elem(0x1F43B675, _elem(0xE7, b"\x00") + _simple_block(p0))
    body = (_elem(0xEC, b"\x00" * 17)         # Void
            + _elem(0x114D9B74, b"")           # SeekHead (empty)
            + _tracks() + cluster
            + _elem(0x1C53BB6B, b""))          # Cues (empty)
    frames, meta = parse_mkv(_wrap_segment(body))
    assert meta["n_frames"] == 1


def test_crc32_verified_and_corruption_detected():
    y, u, v = _planes(seed=10, n=2)
    data = bytearray(encode_mkv((y, u, v)))
    # the writer embeds CRC-32 in Info and Tracks; flip a byte inside the
    # TimestampScale payload (after the CRC) and the reader must object
    idx = bytes(data).find(bytes.fromhex("2AD7B1"))
    assert idx > 0
    data[idx + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-32 mismatch"):
        parse_mkv(bytes(data))


def test_compressed_codec_metadata_parses_decode_raises():
    cluster = _elem(0x1F43B675, _elem(0xE7, b"\x00")
                    + _simple_block(b"\x00" * 30))
    data = _wrap_segment(_tracks(codec=b"V_VP8") + cluster, doctype=b"webm")
    meta = parse_mkv_meta(data)
    assert meta["codec"] == "V_VP8" and meta["doctype"] == "webm"
    assert meta["w"] == 8 and meta["n_frames"] == 1
    with pytest.raises(NotImplementedError, match="V_VP8"):
        parse_mkv(data)


# --- raise-never-misdecode -----------------------------------------------


def test_not_ebml_raises():
    with pytest.raises(ValueError, match="not an EBML"):
        parse_mkv_meta(b"RIFF....")
    with pytest.raises(ValueError):
        parse_mkv_meta(b"")


def test_unsupported_doctype_raises():
    data = _wrap_segment(_tracks(), doctype=b"tango")
    with pytest.raises(ValueError, match="doctype"):
        parse_mkv_meta(data)


def test_truncated_element_raises():
    y, u, v = _planes(seed=11, n=3)
    data = encode_mkv((y, u, v))
    with pytest.raises(ValueError):
        parse_mkv_meta(data[: len(data) - 7])


def test_wrong_payload_size_raises():
    bad = _i420_payload(12) + b"\x00"  # one byte too long for 8x6 I420
    cluster = _elem(0x1F43B675, _elem(0xE7, b"\x00") + _simple_block(bad))
    with pytest.raises(ValueError, match="I420 frame"):
        parse_mkv(_wrap_segment(_tracks() + cluster))


def test_no_video_track_raises():
    with pytest.raises(ValueError, match="no video track"):
        parse_mkv_meta(_wrap_segment(_elem(0x1654AE6B, b"")))


def test_fixed_lacing_indivisible_raises():
    # 2 laced frames (count byte 1) over a 31-byte payload can't split
    blk = _elem(0xA3, _encode_vint(1) + struct.pack(">h", 0)
                + bytes([0x80 | 0x04]) + b"\x01" + b"\x00" * 31)
    cluster = _elem(0x1F43B675, _elem(0xE7, b"\x00") + blk)
    with pytest.raises(ValueError, match="fixed lacing"):
        parse_mkv(_wrap_segment(_tracks() + cluster))


def test_encoder_input_validation():
    y, u, v = _planes(seed=13)
    with pytest.raises(ValueError, match="doctype"):
        encode_mkv((y, u, v), doctype="avi")
    with pytest.raises(ValueError, match="even"):
        encode_mkv((y[:, :5, :], u, v))
    with pytest.raises(ValueError, match="chroma"):
        encode_mkv((y, u[:, :2, :], v))


def test_decode_i420_frame_matches_y4m_upsample():
    y, u, v = _planes(seed=14, n=1)
    payload = y[0].tobytes() + u[0].tobytes() + v[0].tobytes()
    fr = decode_i420_frame(payload, 0, len(payload), 8, 6)
    _assert_planes(fr[None, ...], y, u, v)
