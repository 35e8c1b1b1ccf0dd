"""Geohash base-32 cell family: public test vectors, four-way implementation
parity (py / np / Column / SQL), and the prefix res-ladder property."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from activity_files_spark.functions.geohash import (
    geohash_col,
    geohash_int_col,
    geohash_np,
    geohash_py,
    geohash_sql,
)

GRID = [(40.0 + i * 0.0005, -105.0 - i * 0.0005) for i in range(40)] + [
    (0.0, 0.0), (-33.86, 151.2), (85.0, 179.9), (-85.0, -179.9),
    (90.0, 180.0), (-90.0, -180.0),
]


def test_public_vectors():
    # The two canonical public geohash examples (Wikipedia / geohash.org).
    assert geohash_py(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geohash_py(42.605, -5.603, 5) == "ezs42"
    # precision truncation == prefix (free res-ladder)
    assert geohash_py(57.64911, 10.40744, 5) == "u4pru"


@pytest.mark.parametrize("p", [1, 5, 6, 12])
def test_geohash_four_way_parity(spark, p):
    py = [geohash_py(a, b, p) for a, b in GRID]
    lats = np.array([a for a, _ in GRID])
    lons = np.array([b for _, b in GRID])
    assert list(geohash_np(lats, lons, p)) == py

    df = spark.createDataFrame(GRID, "lat double, lon double")
    got = [
        r["c"]
        for r in df.select(geohash_col(F.col("lat"), F.col("lon"), p).alias("c")).collect()
    ]
    assert got == py

    x, y, z, s = geohash_sql("lat", "lon", p)
    vals = ", ".join(f"({a}, {b})" for a, b in GRID)
    sql = f"""
    WITH t(lat, lon) AS (VALUES {vals}),
    xy AS (SELECT {x} AS gx, {y} AS gy FROM t),
    code AS (SELECT {z} AS gz FROM xy)
    SELECT {s} AS c FROM code
    """
    duck = [r[0] for r in duckdb.sql(sql).fetchall()]
    assert duck == py


def test_prefix_ladder_property(spark):
    # every finer-precision geohash is prefixed by its coarser parent, both
    # in pure python and through the Column path
    for lat, lon in GRID:
        h12 = geohash_py(lat, lon, 12)
        for p in range(1, 12):
            assert geohash_py(lat, lon, p) == h12[:p]
    df = spark.createDataFrame(GRID, "lat double, lon double")
    row = df.select(
        F.sum(
            (
                F.substring(geohash_col(F.col("lat"), F.col("lon"), 9), 1, 4)
                == geohash_col(F.col("lat"), F.col("lon"), 4)
            ).cast("int")
        ).alias("ok")
    ).collect()[0]
    assert row["ok"] == len(GRID)


def test_int_code_matches_string(spark):
    # the BIGINT layout form decodes to the same base-32 string
    from activity_files_spark.functions.geohash import BASE32

    df = spark.createDataFrame(GRID, "lat double, lon double")
    rows = df.select(
        geohash_int_col(F.col("lat"), F.col("lon"), 6).alias("z"),
        geohash_col(F.col("lat"), F.col("lon"), 6).alias("s"),
    ).collect()
    for r in rows:
        s = "".join(BASE32[(r["z"] >> (5 * (5 - j))) & 31] for j in range(6))
        assert s == r["s"]


def test_precision_bounds():
    with pytest.raises(ValueError):
        geohash_py(0.0, 0.0, 0)
    with pytest.raises(ValueError):
        geohash_py(0.0, 0.0, 13)
