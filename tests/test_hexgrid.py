"""Hex (H3-style) res-ladder: four-way implementation parity, pinned
goldens on the fixture grid, geometric sanity (center distance bound)."""

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from activity_files_spark.functions.hexgrid import (
    BASE_DEG,
    hex_cell_col,
    hex_cell_np,
    hex_cell_py,
    hex_cell_sql,
    hex_center_py,
)

GRID = [(40.0 + i * 0.0005, -105.0 - i * 0.0005) for i in range(40)] + [
    (0.0, 0.0), (-33.86, 151.2), (85.0, 179.9), (-85.0, -179.9),
]


@pytest.mark.parametrize("res", [4, 6, 8])
def test_hex_four_way_parity(spark, res):
    py = [hex_cell_py(a, b, res) for a, b in GRID]
    lats = np.array([a for a, _ in GRID])
    lons = np.array([b for _, b in GRID])
    assert list(hex_cell_np(lats, lons, res)) == py

    df = spark.createDataFrame(GRID, "lat double, lon double")
    got = [r["c"] for r in df.select(hex_cell_col(F.col("lat"), F.col("lon"), res).alias("c")).collect()]
    assert got == py

    vals = ", ".join(f"({a}, {b})" for a, b in GRID)
    sql = f"SELECT {hex_cell_sql('lat', 'lon', res)} AS c FROM (VALUES {vals}) t(lat, lon)"
    duck = [r[0] for r in duckdb.sql(sql).fetchall()]
    assert duck == py


def test_hex_goldens_pinned():
    # FIXTURES.md §7: goldens generated once by the pure-python kernel and
    # pinned, so the distributed path must reproduce them forever.
    assert hex_cell_py(40.0, -105.0, 4) == 20266118966935979
    assert hex_cell_py(40.0, -105.0, 8) == 38279326294088363
    assert hex_cell_py(40.0005, -105.0005, 8) == 38279326294088363  # same cell
    assert hex_cell_py(40.05, -105.05, 8) != hex_cell_py(40.0, -105.0, 8)


def test_hex_center_distance_bound():
    # every point lies within one circumradius of its cell center
    for res in (4, 6, 8):
        s = BASE_DEG / (1 << res)
        for lat, lon in GRID[:40]:
            c = hex_cell_py(lat, lon, res)
            clat, clon = hex_center_py(c)
            d = math.hypot(lat - clat, lon - clon)
            assert d <= s + 1e-9, (res, lat, lon, d, s)


def test_hex_resolution_monotonic():
    # finer resolutions distinguish nearby points that coarse ones merge
    a4 = hex_cell_py(40.0, -105.0, 4)
    b4 = hex_cell_py(40.002, -105.002, 4)
    a12 = hex_cell_py(40.0, -105.0, 12)
    b12 = hex_cell_py(40.002, -105.002, 12)
    assert a4 == b4  # ~0.003 deg apart, res-4 hexes are 1/16 deg
    assert a12 != b12
