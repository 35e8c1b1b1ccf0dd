"""Multimodal columns: audio/video as opaque binary + typed metadata.

The container has no media libraries, so the DECODE step is a clearly
marked stub (NotImplementedError for real codecs, a deterministic fake for
the synthetic fixtures) — but the Spark-side plumbing is real and tested:
schemas, Arrow batch shapes, frame/sample offset math, and partitioning all
behave exactly as they would with a real libav/soundfile binding dropped in.

Schemas:
  audio: (clip_id string, bytes binary, sample_rate int, n_samples long,
          channels int, fmt string)
  video: (clip_id string, bytes binary, w int, h int, fps double,
          n_frames long, fmt string)

Fake codecs ("rawpcm16" / "rawrgb") are REAL in the sense that the bytes
are exactly the samples/frames — so offset math is fully exercised.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

AUDIO_SCHEMA = (
    "clip_id string, bytes binary, sample_rate int, n_samples long, "
    "channels int, fmt string"
)
VIDEO_SCHEMA = (
    "clip_id string, bytes binary, w int, h int, fps double, n_frames long, fmt string"
)

REAL_AUDIO_FMTS = {"mp3", "flac", "ogg"}  # compressed codecs: stubbed
REAL_VIDEO_FMTS = {"mp4", "webm", "mkv"}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """REAL RIFF/WAVE PCM16 encoder (no external libs — the container spec:
    RIFF header + fmt chunk (audio format 1, little-endian) + data chunk).
    ``samples``: int16 (n_samples, channels)."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav wants int16 samples")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt_chunk = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate,
                            byte_rate, ch * 2, 16)
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff_len = 4 + len(fmt_chunk) + len(data_chunk)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt_chunk + data_chunk


def parse_wav(data: bytes) -> tuple[np.ndarray, int]:
    """REAL RIFF/WAVE PCM16 decoder: walks the chunk list (tolerating extra
    chunks like LIST/INFO), reads the fmt header, returns
    (int16 (n_samples, channels), sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    channels = sample_rate = bits = None
    pcm = None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_format, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_format != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV audio_format={audio_format} bits={bits}: only "
                    "PCM16 is implemented"
                )
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if channels is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    arr = np.frombuffer(pcm, dtype="<i2")
    return arr.reshape(len(arr) // channels, channels), int(sample_rate)


def decode_audio(data: bytes, fmt: str, n_samples: int, channels: int) -> np.ndarray:
    """-> int16 array (n_samples, channels). WAV/PCM16 decodes for real;
    compressed codecs (mp3/flac/ogg) are honestly stubbed."""
    if fmt == "wav":
        samples, _ = parse_wav(bytes(data))
        return samples
    if fmt in REAL_AUDIO_FMTS:
        raise NotImplementedError(
            f"audio codec {fmt!r} needs a soundfile/ffmpeg binding (not in "
            "this container); 'wav' and 'rawpcm16' are decodable here"
        )
    if fmt != "rawpcm16":
        raise ValueError(f"unknown audio fmt {fmt!r}")
    return np.frombuffer(data, dtype="<i2").reshape(n_samples, channels)


def decode_video_frame(data: bytes, fmt: str, w: int, h: int, frame: int) -> np.ndarray:
    """-> uint8 (h, w, 3) for one frame. Real codecs are stubbed."""
    if fmt in REAL_VIDEO_FMTS:
        raise NotImplementedError(
            f"video codec {fmt!r} needs an ffmpeg binding (not in this "
            "container); only 'rawrgb' is decodable here"
        )
    if fmt != "rawrgb":
        raise ValueError(f"unknown video fmt {fmt!r}")
    frame_bytes = w * h * 3
    off = frame * frame_bytes
    return np.frombuffer(data[off : off + frame_bytes], dtype=np.uint8).reshape(h, w, 3)


def synth_audio(spark: SparkSession, n: int, sample_rate: int = 8000, seconds: float = 0.25) -> DataFrame:
    """Deterministic sine-ish PCM16 clips generated executor-side."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                ns = int(sample_rate * seconds)
                t = np.arange(ns)
                wave = (np.sin(2 * np.pi * (100 + int(i) * 7) * t / sample_rate) * 20000).astype("<i2")
                rows.append({
                    "clip_id": f"aud_{int(i):08d}", "bytes": wave.tobytes(),
                    "sample_rate": sample_rate, "n_samples": ns, "channels": 1,
                    "fmt": "rawpcm16",
                })
            yield pd.DataFrame(rows)

    return spark.range(n, numPartitions=max(2, n // 64)).mapInPandas(gen, AUDIO_SCHEMA)


def synth_video(spark: SparkSession, n: int, w: int = 8, h: int = 6, n_frames: int = 5) -> DataFrame:
    """Deterministic raw-RGB clips: frame f pixel (x,y) = fn(i, f, x, y)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                frames = []
                for f in range(n_frames):
                    y, x = np.mgrid[0:h, 0:w]
                    px = np.stack(
                        [(x + f + int(i)) % 256, (y * 3 + f) % 256, (x * y + int(i)) % 256],
                        axis=-1,
                    ).astype(np.uint8)
                    frames.append(px.tobytes())
                rows.append({
                    "clip_id": f"vid_{int(i):08d}", "bytes": b"".join(frames),
                    "w": w, "h": h, "fps": 10.0, "n_frames": n_frames, "fmt": "rawrgb",
                })
            yield pd.DataFrame(rows)

    return spark.range(n, numPartitions=max(2, n // 64)).mapInPandas(gen, VIDEO_SCHEMA)


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip features (rms, peak, zero-crossing rate) via an Arrow kernel.
    The numpy body is exactly what a real decoder would feed."""

    schema = "clip_id string, rms double, peak int, zcr double"

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = decode_audio(bytes(r.bytes), r.fmt, r.n_samples, r.channels).astype(np.float64)
                rms = float(np.sqrt(np.mean(x * x)))
                peak = int(np.max(np.abs(x)))
                zc = float(np.mean(np.abs(np.diff(np.signbit(x[:, 0]).astype(np.int8)))))
                rows.append({"clip_id": r.clip_id, "rms": rms, "peak": peak, "zcr": zc})
            yield pd.DataFrame(rows)

    return audio.mapInPandas(kernel, schema)


def frame_stats(frames: DataFrame) -> DataFrame:
    """Per-sampled-frame channel sums over the decoded RGB pixels
    (clip_id, frame_idx, sum_r, sum_g, sum_b) — exact integer reductions,
    so a SQL oracle can replay them from the pixel formula."""
    schema = "clip_id string, frame_idx int, sum_r long, sum_g long, sum_b long"

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = np.frombuffer(bytes(r.frame_bytes), dtype=np.uint8).reshape(
                    r.h, r.w, 3
                ).astype(np.int64)
                s = px.sum(axis=(0, 1))
                rows.append({
                    "clip_id": r.clip_id, "frame_idx": int(r.frame_idx),
                    "sum_r": int(s[0]), "sum_g": int(s[1]), "sum_b": int(s[2]),
                })
            yield pd.DataFrame(rows)

    return frames.mapInPandas(kernel, schema)


def sample_frames(video: DataFrame, every: int = 2) -> DataFrame:
    """Explode each clip into sampled frames (frame index % every == 0):
    (clip_id, frame_idx, frame_bytes, w, h). Offset math on the raw bytes —
    the exact plumbing a real frame extractor uses."""

    schema = "clip_id string, frame_idx int, frame_bytes binary, w int, h int"

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                fb = r.w * r.h * 3
                data = bytes(r.bytes)
                for f in range(0, int(r.n_frames), every):
                    rows.append({
                        "clip_id": r.clip_id, "frame_idx": f,
                        "frame_bytes": data[f * fb : (f + 1) * fb],
                        "w": r.w, "h": r.h,
                    })
            yield pd.DataFrame(rows)

    return video.mapInPandas(kernel, schema)
