"""Deterministic synthetic image+caption table (FIXTURES.md §1).

Schema exactly per BASELINE.json input_hint:
    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)
plus the implied fixture-grid geolocation (lat, lon) used by tiling/PIP/kNN
so every fixture shares one coordinate frame:
    lat_i = 40.0 + (i % 1000) * 0.0005
    lon_i = -105.0 - (i % 1000) * 0.0005

Every value is a pure function of the row index ``i`` — no wall clock, no
unseeded RNG — so checkpoint/resume tests stay deterministic and the
validation stage can regenerate the expected pixels from ``image_id`` alone.

Generation happens executor-side via ``mapInPandas`` over ``spark.range``:
at 10^12 design scale the generator is just a stand-in for an Iceberg scan,
but the pipeline shape (partitioned source -> Arrow batches) is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from activity_files_spark.codecs.image import decode, encode, phash64
from activity_files_spark.functions.quadkey import quadkey_py

W_CYCLE = (16, 32, 64)
H_CYCLE = (16, 32, 48)
FMT_CYCLE = ("png", "bmp", "jpeg")

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lat double, lon double"
)


def image_meta(i: int) -> tuple[int, int, str, float, float]:
    w = W_CYCLE[i % 3]
    h = H_CYCLE[i % 3]
    fmt = FMT_CYCLE[i % 3]
    lat = 40.0 + (i % 1000) * 0.0005
    lon = -105.0 - (i % 1000) * 0.0005
    return w, h, fmt, lat, lon


def pixels_for(i: int, w: int, h: int) -> np.ndarray:
    """Procedural pixels: channel c at (x, y) is a small affine fn mod 256."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 3 + y * 5 + i * 7) % 256
    g = (x * 7 + y * 11 + i * 13) % 256
    b = (x * 13 + y * 17 + i * 19) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def caption_for(i: int) -> str:
    _, _, _, lat, lon = image_meta(i)
    return f"caption for img_{i:012d} at cell {quadkey_py(lat, lon, 12)}"


def make_image_row(i: int) -> dict:
    """One fully-materialized row (golden-path twin of the Spark generator)."""
    w, h, fmt, lat, lon = image_meta(i)
    px = pixels_for(i, w, h)
    data = encode(px, fmt)
    # phash is computed from the DECODED pixels so the stored value is the
    # invariant the validation stage re-derives (lossy fmts quantize first)
    ph = phash64(decode(data, fmt))
    return {
        "image_id": f"img_{i:012d}",
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption_for(i),
        "phash": ph,
        "lat": lat,
        "lon": lon,
    }


def image_index(image_id: str) -> int:
    return int(image_id.removeprefix("img_"))


def synth_images(spark: SparkSession, n: int, partitions: int = 32) -> DataFrame:
    """Distributed deterministic image table: n rows, executor-side encode."""

    def gen(batches):
        for pdf in batches:
            rows = [make_image_row(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return spark.range(n, numPartitions=partitions).mapInPandas(gen, IMAGE_SCHEMA)
