"""Pure-numpy GIF89a codec (CompuServe GIF, the fourth real image
container beside BMP/PNG/baseline-JPEG in :mod:`codecs.image`).

GIF is palette-indexed: a pixel is an index into a <=256-entry color
table, so 8-bit grayscale (palette entry ``i`` = ``(i, i, i)``) round-trips
LOSSLESSLY — that is the tier this pipeline encodes (the same reasoning
the reference applies when it base64-gates binary payloads rather than
re-compressing them: keep the invariant checkable). Color inputs with
more than 256 distinct colors would need quantization (lossy) and are
rejected rather than silently degraded.

Encoder
-------
Two valid-LZW strategies, both producing streams ANY standard decoder
accepts:

- ``compress=True`` (default for fixtures): the real GIF-variant LZW —
  dictionary build, variable 9->12-bit codes, early-change width bumps,
  clear-on-full. Python dict loop; fine for fixture-sized images.
- ``compress=False`` (the Arrow-batch fast path): the classic
  "uncompressed GIF" technique — every pixel a literal 9-bit code with a
  CLEAR every 253 literals so the dictionary never assigns a code that
  would widen past 9 bits. The whole bitstream is then FIXED-width, so
  the pack is one vectorized numpy ``packbits`` (bit-reversed per byte
  for GIF's LSB-first order) — no per-pixel python at all.

Decoder
-------
General GIF-variant LZW (handles dictionary streams, KwKwK self-reference,
deferred clears, 12-bit cap), global AND local color tables, sub-block
reassembly, extension-block skipping. Interlaced images and animation
composition are honest ``NotImplementedError`` boundaries (single-frame
still images are the pipeline's payload; the first image descriptor wins).

Layout references: GIF89a specification (CompuServe, 1990-07-31) —
public format documentation; no reference-repo counterpart exists
(activity_files ships no raster codec at all).
"""

from __future__ import annotations

import struct

import numpy as np

_CLEAR_BASE = 256  # for 8-bit min code size
_MAX_CODE = 4095  # 12-bit GIF LZW ceiling


# ------------------------------------------------------------------ bits

def _pack_lsb(codes: np.ndarray, width: int) -> bytes:
    """Pack fixed-width codes LSB-first (GIF bit order), vectorized."""
    n = codes.shape[0]
    bits = np.zeros((n, width), dtype=np.uint8)
    for b in range(width):
        bits[:, b] = (codes >> b) & 1
    flat = bits.reshape(-1)
    pad = (-flat.shape[0]) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    # packbits is MSB-first per byte; GIF wants LSB-first -> reverse each 8
    return np.packbits(flat.reshape(-1, 8)[:, ::-1], axis=1).tobytes()


class _BitWriter:
    """Variable-width LSB-first bit accumulator for the real-LZW path."""

    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def put(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def done(self) -> bytes:
        if self._nbits:
            self._out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0
        return bytes(self._out)


# ------------------------------------------------------------------ LZW

def _lzw_encode(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    """Real GIF-variant LZW over palette indices (python dict loop)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    bw.put(clear, width)
    data = indices.tobytes()
    if not data:
        bw.put(eoi, width)
        return bw.done()
    run = data[0:1]
    for i in range(1, len(data)):
        c = data[i : i + 1]
        if run + c in table:
            run += c
            continue
        bw.put(table[run], width)
        table[run + c] = nxt
        # early-change: the width that can hold code `nxt` applies to the
        # NEXT emitted code as soon as `nxt` is assigned
        if nxt == (1 << width) and width < 12:
            width += 1
        nxt += 1
        if nxt > _MAX_CODE:
            bw.put(clear, width)
            table = {bytes([j]): j for j in range(clear)}
            nxt = eoi + 1
            width = min_code_size + 1
        run = c
    bw.put(table[run], width)
    bw.put(eoi, width)
    return bw.done()


def _lzw_encode_literal(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    """'Uncompressed GIF': all-literal codes with periodic CLEARs so the
    code width stays fixed at min_code_size+1 — one vectorized pack."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    flat = indices.astype(np.uint16).ravel()
    # after a CLEAR the decoder assigns a new code per symbol starting at
    # eoi+1; (2^width - 1) - (eoi + 1) + 1 = 253 symbols keep every
    # assigned code (and the widths they imply) strictly below 1<<width
    chunk = (1 << width) - eoi - 2
    n = flat.shape[0]
    n_chunks = (n + chunk - 1) // chunk if n else 0
    parts = [np.array([clear], dtype=np.uint16)]
    for k in range(n_chunks):
        if k:
            parts.append(np.array([clear], dtype=np.uint16))
        parts.append(flat[k * chunk : (k + 1) * chunk])
    parts.append(np.array([eoi], dtype=np.uint16))
    return _pack_lsb(np.concatenate(parts), width)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """General GIF-variant LZW decode -> uint8 palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    out = bytearray()
    pos = 0
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    prev: bytes | None = None
    weights = [1 << b for b in range(13)]
    nbits = bits.shape[0]
    while pos + width <= nbits:
        code = 0
        for b in range(width):
            if bits[pos + b]:
                code += weights[b]
        pos += width
        if code == clear:
            table = []
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < clear:
            entry = base[code]
        elif code - eoi - 1 < len(table):
            entry = table[code - eoi - 1]
        elif prev is not None and code == eoi + 1 + len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF LZW: code {code} out of range at bit {pos}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # early-change mirror: widen when the NEXT assignable code would
        # not fit the current width (12-bit cap, deferred clear allowed)
        if eoi + 1 + len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise ValueError(
            f"GIF LZW: stream ended at {len(out)}/{n_expected} pixels"
        )
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


# ------------------------------------------------------------------ GIF

_GRAY_PALETTE = np.repeat(np.arange(256, dtype=np.uint8), 3).tobytes()


def encode_gif(px: np.ndarray, compress: bool = True) -> bytes:
    """(h, w, 3) uint8 with r==g==b (or (h, w) gray) -> GIF89a bytes.

    Grayscale keeps the codec lossless (palette entry i = (i,i,i));
    non-gray input raises ValueError rather than quantizing.
    """
    if px.ndim == 3:
        if px.shape[2] != 3:
            raise ValueError(f"expected 3 channels, got {px.shape[2]}")
        if not (
            np.array_equal(px[:, :, 0], px[:, :, 1])
            and np.array_equal(px[:, :, 1], px[:, :, 2])
        ):
            raise ValueError(
                "GIF tier is palette-lossless grayscale; color input would "
                "need lossy quantization (encode as png/bmp/jpeg instead)"
            )
        gray = px[:, :, 0]
    elif px.ndim == 2:
        gray = px
    else:
        raise ValueError(f"bad pixel array rank {px.ndim}")
    h, w = gray.shape
    if not h or not w:
        raise ValueError("empty image")
    out = bytearray()
    out += b"GIF89a"
    # logical screen: GCT present, 8-bit color resolution, 2^8 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += _GRAY_PALETTE
    # image descriptor at (0,0), no local table, not interlaced
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(8)  # LZW min code size
    lzw = (
        _lzw_encode(np.ascontiguousarray(gray).ravel())
        if compress
        else _lzw_encode_literal(np.ascontiguousarray(gray))
    )
    for i in range(0, len(lzw), 255):
        blk = lzw[i : i + 255]
        out.append(len(blk))
        out += blk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (h, w, 3) uint8 RGB (first image descriptor).

    Malformed/truncated containers raise ValueError (the repo-wide codec
    error contract; cf. codecs/mp4.py); interlace is NotImplementedError.
    """
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated/malformed GIF: {exc}") from exc


def _decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _par = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=n * 3, offset=pos)
        gct = gct.reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer before any image
            break
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x} at {pos}")
        _, _left, _top, w, h, ipacked = struct.unpack_from("<BHHHHB", data, pos)
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                data, dtype=np.uint8, count=n * 3, offset=pos
            ).reshape(n, 3)
            pos += n * 3
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF")
        if pal is None:
            raise ValueError("GIF image with no color table")
        min_code = data[pos]
        pos += 1
        chunks = []
        while data[pos]:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code, w * h)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF pixel index outside color table")
        return pal[idx].reshape(h, w, 3)
    raise ValueError("GIF contains no image data")


__all__ = ["encode_gif", "decode_gif"]
