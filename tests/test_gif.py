"""GIF89a codec: round-trips, both LZW strategies, container structure,
adversarial inputs, and the Spark round-trip kernel."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from activity_files_spark.codecs.gif import (
    _lzw_decode,
    _lzw_encode,
    _lzw_encode_literal,
    decode_gif,
    encode_gif,
)


def _gray3(g: np.ndarray) -> np.ndarray:
    return np.repeat(g[:, :, None], 3, axis=2)


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize(
    "h,w", [(1, 1), (3, 5), (16, 16), (48, 56), (7, 255), (255, 7), (192, 256)]
)
def test_roundtrip_sizes(h, w, compress):
    rng = np.random.default_rng(h * 1000 + w)
    g = rng.integers(0, 256, (h, w), dtype=np.uint8)
    dec = decode_gif(encode_gif(_gray3(g), compress=compress))
    assert dec.shape == (h, w, 3)
    assert np.array_equal(dec, _gray3(g))


def test_roundtrip_2d_input_equals_3d():
    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    assert encode_gif(g) == encode_gif(_gray3(g))


def test_constant_image_kwkwk():
    # constant pixels force the encoder into long self-referencing runs,
    # the decoder into the KwKwK special case
    for v in (0, 1, 255):
        g = np.full((64, 64), v, dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif(g)), _gray3(g))


def test_dictionary_full_clear_cycle():
    # 49k random pixels assign >4095 dictionary codes -> the encoder must
    # emit a mid-stream CLEAR at 12-bit width and the decoder must resync
    rng = np.random.default_rng(42)
    g = rng.integers(0, 256, (192, 256), dtype=np.uint8)
    data = encode_gif(g, compress=True)
    assert np.array_equal(decode_gif(data), _gray3(g))


def test_literal_path_crosses_clear_chunks():
    # >253 pixels forces periodic CLEARs in the all-literal stream
    g = (np.arange(1000, dtype=np.int64) % 256).astype(np.uint8).reshape(10, 100)
    data = encode_gif(g, compress=False)
    assert np.array_equal(decode_gif(data), _gray3(g))


def test_compressed_beats_literal_on_structured():
    g = np.tile(np.arange(200, dtype=np.uint8), (64, 1))
    assert len(encode_gif(g, compress=True)) < len(encode_gif(g, compress=False))


def test_container_structure():
    g = np.zeros((4, 6), dtype=np.uint8)
    data = encode_gif(g)
    assert data[:6] == b"GIF89a"
    w, h, packed, bg, par = struct.unpack_from("<HHBBB", data, 6)
    assert (w, h) == (6, 4)
    assert packed & 0x80  # global color table present
    assert 2 << (packed & 7) == 256
    # gray palette: entry i = (i, i, i)
    pal = np.frombuffer(data, dtype=np.uint8, count=768, offset=13).reshape(256, 3)
    assert np.array_equal(pal, np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3))
    assert data[13 + 768] == 0x2C
    assert data[-1] == 0x3B
    assert data[-2] == 0x00  # block terminator before trailer


def test_color_input_rejected():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[:, :, 1] = 1
    with pytest.raises(ValueError, match="grayscale"):
        encode_gif(px)


def test_empty_and_bad_rank_rejected():
    with pytest.raises(ValueError):
        encode_gif(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_gif(np.zeros((4,), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_gif(np.zeros((2, 2, 4), dtype=np.uint8))


def test_not_a_gif():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG....")


def test_truncation_everywhere_raises_valueerror():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = encode_gif(g)
    for cut in (4, 8, 12, 13, 100, 13 + 768, 13 + 768 + 5, len(data) - 2):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_gif(data[:cut])


def test_interlace_flag_honest_boundary():
    g = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(encode_gif(g))
    idesc = 13 + 768
    data[idesc + 9] |= 0x40  # set interlace bit
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(data))


def test_extension_blocks_skipped():
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    data = encode_gif(g)
    idesc = 13 + 768
    # splice in a Graphic Control Extension before the image descriptor
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    patched = data[:idesc] + gce + data[idesc:]
    assert np.array_equal(decode_gif(patched), _gray3(g))


def test_gif87a_header_accepted():
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    data = b"GIF87a" + encode_gif(g)[6:]
    assert np.array_equal(decode_gif(data), _gray3(g))


def test_local_color_table_wins():
    # rebuild the stream with an inverted LOCAL palette; decoded values invert
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    data = encode_gif(g)
    idesc = 13 + 768
    head, img = data[:idesc], bytearray(data[idesc:])
    img[9] = 0x87  # local color table, 256 entries
    inv = np.repeat(np.arange(255, -1, -1, dtype=np.uint8), 3).tobytes()
    patched = head + bytes(img[:10]) + inv + bytes(img[10:])
    assert np.array_equal(decode_gif(patched), _gray3(255 - g))


def test_lzw_stream_truncation_detected():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = bytearray(encode_gif(g))
    # claim 16x16 in the image descriptor: LZW stream runs dry
    struct.pack_into("<HH", data, 13 + 768 + 5, 16, 16)
    with pytest.raises(ValueError, match="pixels"):
        decode_gif(bytes(data))


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
    st.booleans(),
)
def test_roundtrip_property(h, w, seed, compress):
    rng = np.random.default_rng(seed)
    # mixed structure: half random, half runs (exercises both code paths)
    g = rng.integers(0, 256, (h, w), dtype=np.uint8)
    if seed % 2:
        g[: h // 2] = seed % 256
    dec = decode_gif(encode_gif(g, compress=compress))
    assert np.array_equal(dec, _gray3(g))


def test_lzw_primitives_cross_parity():
    # dictionary stream and literal stream decode to the same indices
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, 5000, dtype=np.uint8)
    a = _lzw_decode(_lzw_encode(idx), 8, idx.size)
    b = _lzw_decode(_lzw_encode_literal(idx), 8, idx.size)
    assert np.array_equal(a, idx)
    assert np.array_equal(b, idx)


def test_spark_gif_kernel(spark):
    from activity_files_spark.operators.tiling import gif_roundtrip_stats
    from pyspark.sql import functions as F

    ids = spark.range(0, 30, 1, 4).select(F.col("id").alias("i"))
    rows = {r.image_id: r for r in gif_roundtrip_stats(ids).collect()}
    assert len(rows) == 30
    assert all(r.lossless for r in rows.values())
    # spot-check one row against the scalar formula
    i = 17
    w, h = 24 + (i % 5) * 8, 16 + (i % 3) * 16
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    gray = (3 * x + 5 * y + 7 * i) % 256
    r = rows[f"gif_{i:06d}"]
    assert (r.w, r.h, r.n_px) == (w, h, w * h)
    assert r.val_sum == int(gray.sum())
    assert r.moment == int((gray * (y * w + x + 1)).sum())
    assert r.n_bytes > 0
