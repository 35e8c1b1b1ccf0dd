"""Pure-python ISO BMFF (MP4/QuickTime) container codec for uncompressed
``'raw '`` RGB video — fully public formats: ISO/IEC 14496-12 defines the
box structure and sample tables; the classic QuickTime File Format spec
defines the ``'raw '`` video sample entry (uncompressed interleaved RGB,
depth 24), which ffmpeg's rawvideo path reads and writes.

This is the fifth REAL codec in the multimodal surface (WAV, FLAC,
Ogg-FLAC, Y4M — operators/multimodal.py): the container layer (box walk,
track/media headers, and the stts/stsc/stsz/stco sample tables that map
sample index -> byte range in mdat) is implemented for real, and the
payload decodes for real when the sample entry is ``'raw '``. Compressed
sample entries (avc1/hev1/vp09/av01...) keep the honest
NotImplementedError boundary — their *container* metadata and sample
ranges still parse, which is exactly what a 100 TB pipeline needs to
route/filter clips by codec and dimensions before spending decode cycles.

Reference parity note: the reference repo (activity_files) has NO video
codecs; this file exists for the multimodal-pipeline axis of the north
star, mirroring the Y4M pattern at multimodal.py:115-240.

Writer layout (self-contained, single video track):
  ftyp(isom) | mdat(frame0 frame1 ...) | moov(mvhd trak(tkhd mdia(mdhd
  hdlr(vide) minf(vmhd dinf(dref(url )) stbl(stsd('raw ' VisualSampleEntry)
  stts stsc stsz stco)))))
mdat-before-moov keeps stco offsets computable in one pass; the parser
handles either order (it indexes boxes before resolving offsets).
"""

from __future__ import annotations

import struct

import numpy as np

_MOVIE_TIMESCALE = 1000  # mvhd ticks/sec (ms)


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), fourcc) + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def encode_mp4_raw(
    frames: np.ndarray,
    fps: tuple[int, int] = (30, 1),
) -> bytes:
    """Encode uint8 (n, h, w, 3) RGB frames as an ISO BMFF file with one
    video track whose sample entry is the QuickTime ``'raw '`` uncompressed
    RGB format (depth 24): one frame per sample, constant duration
    fps[1]/fps[0] seconds at a media timescale of fps[0] ticks/sec."""
    f = np.asarray(frames)
    if f.dtype != np.uint8 or f.ndim != 4 or f.shape[3] != 3:
        raise ValueError("encode_mp4_raw wants uint8 (n, h, w, 3)")
    n, h, w, _ = f.shape
    if n == 0:
        raise ValueError("encode_mp4_raw wants at least one frame")
    sample_size = h * w * 3
    media_timescale = fps[0]
    sample_delta = fps[1]
    duration_media = n * sample_delta
    duration_movie = (duration_media * _MOVIE_TIMESCALE) // media_timescale

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41")
    mdat_payload = f.tobytes()
    mdat = _box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8  # all samples in one chunk at mdat start

    # --- stbl ---
    # VisualSampleEntry 'raw ': 6 reserved + data_ref_index, 16 bytes of
    # pre_defined/reserved, w, h, 72dpi x/y, reserved, frame_count 1,
    # 32-byte pascal compressorname, depth 24, pre_defined -1
    vse = (
        bytes(6) + struct.pack(">H", 1)
        + bytes(16)
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + bytes(4)
        + struct.pack(">H", 1)
        + bytes(32)
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"raw ", vse))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">III", sample_size, n, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url_ = _full(b"url ", 0, 1, b"")  # flag 1: data in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)

    hdlr = _full(b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(12) + b"raw video\x00")
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, media_timescale, duration_media)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in_movie | in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, duration_movie)
        + bytes(8)
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, _MOVIE_TIMESCALE, duration_movie)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + bytes(10)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)
        + struct.pack(">I", 2),  # next track id
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the box sequence in
    data[start:end]. Handles 64-bit largesize and size==0 (to-end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated box header at byte {pos}")
        size, fourcc = struct.unpack_from(">I4s", data, pos)
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box at byte {pos}")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {fourcc!r} overruns container at byte {pos}")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _walk_boxes(data, start, end):
        if fc == fourcc:
            return b, e
    return None


def _full_body(data: bytes, span) -> tuple[int, int, int]:
    """-> (version, body_start_after_version_flags, end)."""
    b, e = span
    return data[b], b + 4, e


def parse_mp4_meta(data: bytes) -> dict:
    """Container-level metadata walk (codec-agnostic, always real): returns
    {w, h, codec, n_samples, media_timescale, duration_ticks,
    sample_ranges: [(offset, size), ...]} for the first video track,
    resolving the stts/stsc/stsz/stco sample tables to absolute byte
    ranges — the core demux math every ISO BMFF reader performs.
    Malformed tables raise ValueError — never mis-decode."""
    try:
        return _parse_meta_inner(data)
    except (struct.error, IndexError) as exc:
        # normalize out-of-buffer reads on malformed tables to the
        # module's documented exception type (same contract as parse_flac)
        raise ValueError(f"malformed ISO BMFF stream: {exc}") from exc


def _parse_meta_inner(data: bytes) -> dict:
    end = len(data)
    moov = _find(data, 0, end, b"moov")
    if moov is None:
        raise ValueError("ISO BMFF stream has no moov box")
    for fc, tb, te in _walk_boxes(data, *moov):
        if fc != b"trak":
            continue
        mdia = _find(data, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find(data, *mdia, b"minf")
        mdhd = _find(data, *mdia, b"mdhd")
        if minf is None or mdhd is None:
            raise ValueError("video trak missing minf/mdhd")
        ver, mb, _ = _full_body(data, mdhd)
        if ver == 1:
            timescale, duration = struct.unpack_from(">IQ", data, mb + 16)
        else:
            timescale, duration = struct.unpack_from(">II", data, mb + 8)
        stbl = _find(data, *minf, b"stbl")
        if stbl is None:
            raise ValueError("video trak missing stbl")
        return _parse_stbl(data, stbl, timescale, duration)
    raise ValueError("ISO BMFF stream has no video track")


def _parse_stbl(data: bytes, stbl, timescale: int, duration: int) -> dict:
    spans = {fc: (b, e) for fc, b, e in _walk_boxes(data, *stbl)}
    for need in (b"stsd", b"stsz", b"stco", b"stsc"):
        if need not in spans and not (need == b"stco" and b"co64" in spans):
            raise ValueError(f"stbl missing {need.decode()} sample table")

    # stsd -> first sample entry: codec fourcc + dimensions
    _, b, e = _full_body(data, spans[b"stsd"])
    entry = next(_walk_boxes(data, b + 4, e), None)
    if entry is None:
        raise ValueError("empty stsd")
    codec, eb, _ = entry
    w, h = struct.unpack_from(">HH", data, eb + 24)

    # stsz: uniform or per-sample sizes
    _, b, _ = _full_body(data, spans[b"stsz"])
    uniform, count = struct.unpack_from(">II", data, b)
    if count > len(data):
        # more samples than file bytes: a lying count field must not
        # drive a giant allocation before the range checks below
        raise ValueError(
            f"malformed ISO BMFF stream: stsz count {count} exceeds file size"
        )
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", data, b + 8))

    # stco/co64: chunk offsets
    if b"stco" in spans:
        _, b, _ = _full_body(data, spans[b"stco"])
        (n_chunks,) = struct.unpack_from(">I", data, b)
        chunk_offs = list(struct.unpack_from(f">{n_chunks}I", data, b + 4))
    else:
        _, b, _ = _full_body(data, spans[b"co64"])
        (n_chunks,) = struct.unpack_from(">I", data, b)
        chunk_offs = list(struct.unpack_from(f">{n_chunks}Q", data, b + 4))

    # stsc: run-length (first_chunk, samples_per_chunk) -> expand per chunk
    _, b, _ = _full_body(data, spans[b"stsc"])
    (n_runs,) = struct.unpack_from(">I", data, b)
    runs = [struct.unpack_from(">III", data, b + 4 + 12 * i) for i in range(n_runs)]
    per_chunk = []
    for i, (first, spc, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        per_chunk += [spc] * (last - first + 1)
    if len(per_chunk) != n_chunks:
        raise ValueError("stsc runs do not cover the chunk list")

    # resolve sample -> absolute byte range
    ranges: list[tuple[int, int]] = []
    si = 0
    for ci, off in enumerate(chunk_offs):
        pos = off
        for _ in range(per_chunk[ci]):
            if si >= len(sizes):
                break
            ranges.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    if si != len(sizes):
        raise ValueError(
            f"sample tables disagree: {len(sizes)} sizes, {si} chunked samples"
        )
    for off, size in ranges:
        if off + size > len(data):
            raise ValueError("sample range overruns file (truncated mdat?)")
    return {
        "w": int(w), "h": int(h),
        "codec": codec.decode("ascii", "replace"),
        "n_samples": len(sizes),
        "media_timescale": int(timescale),
        "duration_ticks": int(duration),
        "sample_ranges": ranges,
    }


def parse_mp4_raw(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode an ISO BMFF file whose video track uses the ``'raw '``
    uncompressed RGB sample entry -> (uint8 (n, h, w, 3) frames, meta).
    Compressed sample entries parse their container metadata but raise the
    honest codec boundary."""
    meta = parse_mp4_meta(data)
    if meta["codec"] != "raw ":
        raise NotImplementedError(
            f"mp4 sample entry {meta['codec']!r} needs an ffmpeg binding "
            "(not in this container); 'raw ' (uncompressed RGB) decodes here"
        )
    w, h = meta["w"], meta["h"]
    fsz = w * h * 3
    frames = np.zeros((meta["n_samples"], h, w, 3), dtype=np.uint8)
    for i, (off, size) in enumerate(meta["sample_ranges"]):
        if size != fsz:
            raise ValueError(
                f"raw RGB sample {i} is {size} bytes, expected {fsz} for {w}x{h}"
            )
        frames[i] = np.frombuffer(data, np.uint8, fsz, off).reshape(h, w, 3)
    return frames, meta
