"""MPEG audio (MP3) frame-layer codec tests — codecs/mp3.py.

The frame layer is public (ISO/IEC 11172-3 §2.4): sync walk, per-frame
length math, CRC-16 protection, ID3v2/ID3v1 tags, Xing/VBRI VBR headers.
The PCM payload stays an honest stub (multimodal.STUB_AUDIO_FMTS).
"""

import struct

import numpy as np
import pytest

from activity_files_spark.codecs.mp3 import (
    _BITRATES,
    crc16_mpeg,
    encode_mp3_frames,
    frame_length,
    parse_mp3_meta,
    samples_per_frame,
    side_info_length,
)
from activity_files_spark.operators.multimodal import (
    STUB_AUDIO_FMTS,
    decode_audio,
)


def test_cbr_roundtrip_basic():
    b = encode_mp3_frames([(9, 0)] * 4, sample_rate_idx=0)
    m = parse_mp3_meta(b)
    assert m["n_frames"] == 4
    assert m["samples_total"] == 4 * 1152
    assert m["sample_rate"] == 44100 and m["version"] == "MPEG1"
    assert m["layer"] == 3 and m["channel_mode"] == "joint_stereo"
    assert m["distinct_bitrates"] == 1
    assert m["bitrate_sum_kbps"] == 4 * 128
    # 144000*128//44100 = 417
    assert m["audio_bytes"] == 4 * 417
    assert m["crc_frames"] == 0 and m["xing"] is None
    assert not m["truncated"] and m["resync_bytes"] == 0


def test_vbr_with_crc_xing_and_tags():
    frames = [(1 + (7 + k) % 14, (7 + k) % 2) for k in range(9)]
    b = encode_mp3_frames(frames, sample_rate_idx=1, crc=True, id3v2_pad=33,
                          id3v1=True, xing_frames=9, payload_seed=7)
    m = parse_mp3_meta(b)
    assert m["n_frames"] == 10  # 9 audio + the Xing frame
    assert m["crc_frames"] == 10 and m["crc_ok_frames"] == 10
    assert m["xing"] == {"kind": "Xing", "frames": 9, "bytes": None,
                         "quality": None}
    assert m["id3v2_bytes"] == 43 and m["id3v1"]
    brs = _BITRATES[("V1", 3)]
    exp_bytes = sum(144000 * brs[bi - 1] // 48000 + pad
                    for bi, pad in [frames[0]] + frames)
    assert m["audio_bytes"] == exp_bytes
    assert m["distinct_bitrates"] == len({brs[bi - 1] for bi, _ in frames})


def test_crc_detects_corruption():
    b = bytearray(encode_mp3_frames([(8, 0)] * 3, crc=True))
    m0 = parse_mp3_meta(bytes(b))
    assert m0["crc_ok_frames"] == 3
    b[5] ^= 0x01  # stored CRC byte of frame 0
    assert parse_mp3_meta(bytes(b))["crc_ok_frames"] == 2
    b2 = bytearray(encode_mp3_frames([(8, 0)] * 3, crc=True))
    b2[10] ^= 0x40  # a protected side-info byte
    assert parse_mp3_meta(bytes(b2))["crc_ok_frames"] == 2
    # payload bytes AFTER the side info are NOT CRC-protected
    b3 = bytearray(encode_mp3_frames([(8, 0)] * 3, crc=True))
    si = side_info_length("MPEG1", "joint_stereo")
    b3[4 + 2 + si + 5] ^= 0x40
    assert parse_mp3_meta(bytes(b3))["crc_ok_frames"] == 3


def test_resync_skips_junk_and_false_sync():
    # 0xFF 0xFB with bitrate index 0 (free format) is not walkable — the
    # scanner must skip it and land on the real first frame
    junk = bytes([0xFF, 0xFB, 0x00, 0x00, 1, 2, 3])
    m = parse_mp3_meta(junk + encode_mp3_frames([(5, 0), (6, 1), (7, 0)]))
    assert m["n_frames"] == 3 and m["resync_bytes"] == len(junk)


def test_truncated_final_frame_flagged():
    m = parse_mp3_meta(encode_mp3_frames([(5, 0), (6, 1)])[:-5])
    assert m["n_frames"] == 1 and m["truncated"]


def test_versions_layers_frame_math():
    # MPEG1 Layer I: (12000*br//sr + pad)*4, 384 samples
    m1 = parse_mp3_meta(encode_mp3_frames([(4, 1)] * 2, layer=1))
    assert m1["samples_total"] == 768
    assert m1["audio_bytes"] == 2 * (12000 * 128 // 44100 + 1) * 4
    # MPEG1 Layer II: 144000*br//sr, 1152 samples
    m2 = parse_mp3_meta(encode_mp3_frames([(4, 0)] * 2, layer=2))
    assert m2["samples_total"] == 2304
    assert m2["audio_bytes"] == 2 * (144000 * 64 // 44100)
    # MPEG2.5 Layer III: 72000*br//sr, 576 samples, quarter-rate table
    m3 = parse_mp3_meta(encode_mp3_frames(
        [(3, 0)] * 2, version="MPEG2.5", sample_rate_idx=2,
        channel_mode="mono"))
    assert m3["sample_rate"] == 8000 and m3["samples_total"] == 1152
    assert m3["audio_bytes"] == 2 * (72000 * 24 // 8000)
    assert frame_length("MPEG2", 3, 64, 22050, 1) == 72000 * 64 // 22050 + 1
    assert samples_per_frame("MPEG2", 3) == 576


def test_mpeg2_mono_crc_side_info():
    b = encode_mp3_frames([(9, 0)] * 3, version="MPEG2", sample_rate_idx=0,
                          channel_mode="mono", crc=True)
    m = parse_mp3_meta(b)
    assert m["crc_ok_frames"] == 3
    assert side_info_length("MPEG2", "mono") == 9


def test_id3v2_footer_flag_and_id3v1_only():
    # hand-build an ID3v2 tag with the footer flag: span = 10 + size + 10
    tag = b"ID3\x04\x00\x10" + bytes([0, 0, 0, 12]) + bytes(12 + 10)
    m = parse_mp3_meta(tag + encode_mp3_frames([(5, 0)] * 2))
    assert m["id3v2_bytes"] == 32 and m["resync_bytes"] == 0
    assert m["n_frames"] == 2
    # a stream that is ONLY tags parses to zero frames, no crash
    m2 = parse_mp3_meta(tag + b"TAG" + bytes(125))
    assert m2["n_frames"] == 0 and m2["id3v1"]


def test_vbri_header():
    # VBRI sits 32 bytes after the END of the 4-byte header (frame offset
    # 36, the Fraunhofer spec position); build frame 0 by hand
    base = encode_mp3_frames([(9, 0), (9, 0)], sample_rate_idx=0)
    b = bytearray(base)
    vp = 36  # absolute offset in the (no-CRC, no-ID3) stream
    b[vp:vp + 4] = b"VBRI"
    b[vp + 4:vp + 6] = struct.pack(">H", 1)      # version
    b[vp + 8:vp + 10] = struct.pack(">H", 77)    # quality
    b[vp + 10:vp + 14] = struct.pack(">I", 9999)  # bytes
    b[vp + 14:vp + 18] = struct.pack(">I", 42)   # frames
    m = parse_mp3_meta(bytes(b))
    assert m["xing"] == {"kind": "VBRI", "frames": 42, "bytes": 9999,
                         "quality": 77}


def test_xing_with_byte_count_and_toc_skip():
    # flags = frames|bytes|toc|quality: field order must honor skipped TOC
    b = bytearray(encode_mp3_frames([(14, 0)] * 2, sample_rate_idx=0))
    si = side_info_length("MPEG1", "joint_stereo")
    p = 4 + si
    payload = (b"Xing" + struct.pack(">I", 0xF) + struct.pack(">I", 2)
               + struct.pack(">I", 1234) + bytes(100)
               + struct.pack(">I", 57))
    b[p:p + len(payload)] = payload
    m = parse_mp3_meta(bytes(b))
    assert m["xing"] == {"kind": "Xing", "frames": 2, "bytes": 1234,
                         "quality": 57}


def test_encoder_validation_errors():
    with pytest.raises(ValueError):
        encode_mp3_frames([(0, 0)])  # free-format index not writable
    with pytest.raises(ValueError):
        encode_mp3_frames([(15, 0)])
    with pytest.raises(ValueError):
        encode_mp3_frames([(5, 0)], sample_rate_idx=3)
    with pytest.raises(ValueError):
        encode_mp3_frames([(5, 0)], version="MPEG3")
    with pytest.raises(ValueError):
        encode_mp3_frames([(5, 0)], layer=0)
    with pytest.raises(ValueError):
        encode_mp3_frames([(5, 0)], channel_mode="quad")
    with pytest.raises(ValueError):
        encode_mp3_frames([(5, 0)], layer=2, crc=True)  # CRC writer is LIII
    with pytest.raises(ValueError):
        parse_mp3_meta("not bytes")  # type: ignore[arg-type]


def test_crc16_mpeg_reference_property():
    # poly 0x8005 MSB-first: appending the CRC makes the register zero —
    # the defining property of a non-reflected CRC with no final xor
    msg = bytes([0x12, 0x34, 0x56, 0x78, 0x9A])
    c = crc16_mpeg(msg)
    assert crc16_mpeg(msg + struct.pack(">H", c)) == 0


def test_empty_and_garbage_inputs():
    assert parse_mp3_meta(b"")["n_frames"] == 0
    g = parse_mp3_meta(bytes(np.arange(500, dtype=np.int64) % 251))
    assert g["n_frames"] == 0 and g["resync_bytes"] > 0


def test_pcm_decode_stays_honest_stub():
    assert "mp3" in STUB_AUDIO_FMTS
    with pytest.raises(NotImplementedError):
        decode_audio(encode_mp3_frames([(9, 0)]), "mp3", 1152, 2)


def test_lone_final_frame_with_trailer_junk():
    # a valid frame followed by >=4 bytes of non-frame trailer (APE tag)
    # must still count as audio: resync falls back to the lone-header scan
    # when no two-header chain exists anywhere
    one = encode_mp3_frames([(9, 0)])
    m = parse_mp3_meta(one + b"APETAGEX" + bytes(24))
    assert m["n_frames"] == 1 and m["resync_bytes"] == 0
    assert not m["truncated"]
    # two-frame version walks identically (asymmetry regression guard)
    m2 = parse_mp3_meta(encode_mp3_frames([(9, 0)] * 2) + b"APETAGEX")
    assert m2["n_frames"] == 2


def test_layer2_protected_frames_are_crc_unchecked():
    # Layer I/II CRC spans depend on the bit-allocation section, which the
    # frame layer does not parse: protected L2 frames must land in
    # crc_unchecked_frames, never as crc_frames-without-crc_ok "failures"
    def l2_frame():
        br = _BITRATES[("V1", 2)][4]  # idx 5 -> 80 kbps
        fl = frame_length("MPEG1", 2, br, 44100, 0)
        word = (0x7FF << 21) | (0b11 << 19) | (0b10 << 17) | (0 << 16) \
            | (5 << 12) | (0 << 10) | (0 << 9) | (0 << 6)
        body = bytes((np.arange(fl - 6, dtype=np.int64) * 17 % 251)
                     .astype(np.uint8))
        return struct.pack(">I", word) + b"\x12\x34" + body

    m = parse_mp3_meta(l2_frame() * 3)
    assert m["n_frames"] == 3 and m["layer"] == 2
    assert m["crc_frames"] == 0 and m["crc_ok_frames"] == 0
    assert m["crc_unchecked_frames"] == 3


def test_vbri_after_crc_frame():
    # with CRC present the payload starts 2 bytes later, so the VBRI probe
    # must shift: fourcc still lands at absolute frame offset 36
    base = encode_mp3_frames([(9, 0), (9, 0)], crc=True)
    b = bytearray(base)
    b[36:40] = b"VBRI"
    b[40 + 4:40 + 6] = struct.pack(">H", 3)       # quality at vp+8
    b[36 + 8:36 + 10] = struct.pack(">H", 7)
    b[36 + 10:36 + 14] = struct.pack(">I", 555)   # bytes
    b[36 + 14:36 + 18] = struct.pack(">I", 11)    # frames
    m = parse_mp3_meta(bytes(b))
    assert m["xing"] == {"kind": "VBRI", "frames": 11, "bytes": 555,
                         "quality": 7}


def test_encoder_xing_misuse_raises():
    with pytest.raises(ValueError, match="Layer III"):
        encode_mp3_frames([(5, 0)], layer=2, xing_frames=5)
    with pytest.raises(ValueError, match="too small for a Xing"):
        # MPEG2.5 8 kbps @ 8000 Hz -> 72 bytes/frame, but side info for
        # non-mono is 17 and 17+12+4 < 72... use mono 8kbps@24000 -> 24B
        encode_mp3_frames([(1, 0)], version="MPEG2", sample_rate_idx=1,
                          xing_frames=1)
