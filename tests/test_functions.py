"""Scalar kernel parity: pure-Python goldens vs numpy vs Spark Column vs SQL.

Haversine constants pinned to the reference (geo_math.dart:8-22); FIT scalar
rules to fit_parser.dart:1213-1365; quadkey four-way implementation equality.
"""

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from activity_files_spark.functions.geo import (
    fit_altitude_m,
    fit_semicircles_to_deg,
    fit_timestamp,
    haversine_m,
    haversine_m_py,
    haversine_sql,
)
from activity_files_spark.functions.quadkey import (
    quadkey_col,
    quadkey_np,
    quadkey_py,
    quadkey_sql,
    tile_bounds_py,
    tile_xy_py,
)


def test_haversine_golden_fixture_grid():
    # canonical 3-point track: 40.0/-105.0 stepping 0.0005 deg
    d = haversine_m_py(40.0, -105.0, 40.0005, -105.0005)
    # ~55.6m + ~42.6m diagonal on the fixture grid
    assert 60 < d < 80
    # symmetric, zero at identity
    assert haversine_m_py(40.0, -105.0, 40.0, -105.0) == 0.0
    assert abs(haversine_m_py(0, 0, 0, 1) - 111194.9) < 1.0  # 1 deg lon at equator


def test_haversine_spark_matches_python(spark):
    rows = [(40.0, -105.0, 40.0005, -105.0005), (51.5, -0.1, 48.85, 2.35)]
    df = spark.createDataFrame(rows, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = df.select(
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    for r, (a, b, c, d_) in zip(got, rows):
        assert math.isclose(r["d"], haversine_m_py(a, b, c, d_), rel_tol=1e-12)


def test_haversine_sql_matches_python():
    # NOTE: cast literals to DOUBLE — DuckDB parses decimal literals as
    # DECIMAL and would subtract exactly, diverging from IEEE double math.
    # Oracle queries always operate on DOUBLE columns, matching Spark.
    expr = haversine_sql(
        "40.0::DOUBLE", "(-105.0)::DOUBLE", "40.0005::DOUBLE", "(-105.0005)::DOUBLE"
    )
    got = duckdb.sql(f"SELECT {expr} AS d").fetchone()[0]
    assert math.isclose(got, haversine_m_py(40.0, -105.0, 40.0005, -105.0005), rel_tol=1e-12)


@pytest.mark.parametrize("z", [8, 10, 12])
def test_quadkey_four_way_parity(spark, z):
    lats = [40.0 + i * 0.0005 for i in range(50)] + [0.0, -33.86, 85.0, -85.0]
    lons = [-105.0 - i * 0.0005 for i in range(50)] + [0.0, 151.2, 179.9, -179.9]
    py = [quadkey_py(a, b, z) for a, b in zip(lats, lons)]
    npv = quadkey_np(np.array(lats), np.array(lons), z)
    assert list(npv) == py

    df = spark.createDataFrame(list(zip(lats, lons)), "lat double, lon double")
    got = [r["qk"] for r in df.select(quadkey_col(F.col("lat"), F.col("lon"), z).alias("qk")).collect()]
    assert got == py

    q = ", ".join(f"({a}, {b})" for a, b in zip(lats, lons))
    sql = f"SELECT {quadkey_sql('lat', 'lon', z)} AS qk FROM (VALUES {q}) t(lat, lon)"
    duck = [r[0] for r in duckdb.sql(sql).fetchall()]
    assert duck == py


def test_quadkey_known_value():
    # Bing maps documented example: lat 47.61, lon -122.33 -> tile (656, 1432) z=12
    x, y = tile_xy_py(47.609722, -122.333056, 12)
    assert (x, y) == (656, 1430)
    assert quadkey_py(47.609722, -122.333056, 3) == "021"


def test_quadkey_prefix_ladder():
    # res ladder property: z-1 key is the z key minus last digit
    for lat, lon in [(40.0, -105.0), (-12.0, 30.5)]:
        for z in range(2, 16):
            assert quadkey_py(lat, lon, z)[: z - 1] == quadkey_py(lat, lon, z - 1)


def test_tile_bounds_roundtrip():
    x, y = tile_xy_py(40.0, -105.0, 12)
    lon_w, lat_s, lon_e, lat_n = tile_bounds_py(x, y, 12)
    assert lon_w <= -105.0 < lon_e
    assert lat_s <= 40.0 < lat_n


def test_fit_scalars(spark):
    df = spark.createDataFrame(
        [(0x7FFFFFFF, 0xFFFF, 0), (1073741824, 2500, 1000000000)],
        "semi long, alt long, fts long",
    )
    out = df.select(
        fit_semicircles_to_deg(F.col("semi")).alias("deg"),
        fit_altitude_m(F.col("alt")).alias("ele"),
        fit_timestamp(F.col("fts")).alias("ts"),
    ).collect()
    assert out[0]["deg"] is None and out[0]["ele"] is None and out[0]["ts"] is None
    assert out[1]["deg"] == 90.0  # 2^30 semicircles = 90 deg
    assert out[1]["ele"] == 0.0  # 2500/5 - 500
    # 1989-12-31 + 1e9 s = 2021-09-04T01:20:00Z
    assert str(out[1]["ts"]).startswith("2021-09-0")


def test_bearing_and_turn_angle(spark):
    """Compass goldens (E=90, N=0, W=270, S=180 on the equator) and
    Column/SQL twin parity on irregular pairs."""
    import duckdb
    from pyspark.sql import functions as F

    from activity_files_spark.functions.geo import (
        bearing_deg,
        bearing_sql,
        turn_angle_deg,
        turn_angle_sql,
    )

    pairs = [
        (0.0, 0.0, 0.0, 1.0),    # due east -> 90
        (0.0, 0.0, 1.0, 0.0),    # due north -> 0
        (0.0, 0.0, 0.0, -1.0),   # due west -> 270
        (0.0, 0.0, -1.0, 0.0),   # due south -> 180
        (40.0, -105.0, 40.3, -104.7),
        (40.0, -105.0, 39.9, -105.4),
        (57.64911, 10.40744, 57.65, 10.41),
    ]
    df = spark.createDataFrame(pairs, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = [
        r["b"] for r in df.select(
            bearing_deg(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("b")
        ).collect()
    ]
    assert got[0] == 90.0 and got[1] == 0.0 and got[2] == 270.0 and got[3] == 180.0
    # CAST: bare VALUES literals are DECIMAL in DuckDB, whose exact
    # subtraction diverges from double subtraction in the last bits
    vals = ", ".join(
        f"(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE), CAST({c} AS DOUBLE), CAST({d} AS DOUBLE))"
        for a, b, c, d in pairs
    )
    sql = (
        f"SELECT {bearing_sql('lat1', 'lon1', 'lat2', 'lon2')} AS b "
        f"FROM (VALUES {vals}) t(lat1, lon1, lat2, lon2)"
    )
    duck = [r[0] for r in duckdb.sql(sql).fetchall()]
    assert duck == got  # bit-identical twins
    # turn angle: wrap-around 350 -> 10 is a 20 degree turn, both tiers
    t_df = spark.createDataFrame([(350.0, 10.0), (10.0, 190.0), (90.0, 90.0)], "b1 double, b2 double")
    t_got = [r["t"] for r in t_df.select(
        turn_angle_deg(F.col("b1"), F.col("b2")).alias("t")).collect()]
    assert t_got == [20.0, 180.0, 0.0]
    t_duck = [r[0] for r in duckdb.sql(
        f"SELECT {turn_angle_sql('b1', 'b2')} AS t FROM (VALUES (350.0, 10.0), (10.0, 190.0), (90.0, 90.0)) t(b1, b2)"
    ).fetchall()]
    assert t_duck == t_got


def test_project_inverse_of_bearing_and_haversine():
    import math

    from activity_files_spark.functions.geo import haversine_m_py, project_py

    def bearing_scalar(lat1, lon1, lat2, lon2):
        d2r = math.pi / 180.0
        y = math.sin((lon2 - lon1) * d2r) * math.cos(lat2 * d2r)
        x = math.cos(lat1 * d2r) * math.sin(lat2 * d2r) - math.sin(
            lat1 * d2r
        ) * math.cos(lat2 * d2r) * math.cos((lon2 - lon1) * d2r)
        deg = math.atan2(y, x) * 180.0 / math.pi
        return deg + 360.0 if deg < 0 else deg

    cases = [
        (40.0, -105.0, 0.0, 1000.0),
        (40.0, -105.0, 90.0, 5000.0),
        (40.0, -105.0, 222.5, 12345.0),
        (-33.9, 18.4, 135.0, 800.0),
        (0.0, 0.0, 45.0, 10000.0),
    ]
    for lat, lon, brg, d in cases:
        lat2, lon2 = project_py(lat, lon, brg, d)
        # round trip: distance back ≈ d, initial bearing ≈ brg
        assert abs(haversine_m_py(lat, lon, lat2, lon2) - d) < 1e-6 * d + 1e-6
        got_b = bearing_scalar(lat, lon, lat2, lon2)
        db = abs(got_b - brg)
        assert min(db, 360.0 - db) < 1e-6


def test_project_zero_distance_is_identity():
    from activity_files_spark.functions.geo import project_py

    lat2, lon2 = project_py(47.1, 8.2, 123.0, 0.0)
    assert abs(lat2 - 47.1) < 1e-12 and abs(lon2 - 8.2) < 1e-12


def test_project_spark_duckdb_scalar_three_way(spark):
    import duckdb
    from pyspark.sql import functions as F

    from activity_files_spark.functions.geo import project_cols, project_py, project_sql

    rows = [
        (i, 40.0 + i * 0.013, -105.0 - i * 0.017, (i * 37.3) % 360.0, 100.0 + i * 93.0)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "i long, lat double, lon double, brg double, d double")
    lat2, lon2 = project_cols(F.col("lat"), F.col("lon"), F.col("brg"), F.col("d"))
    got = {r.i: (r.a, r.b) for r in df.select("i", lat2.alias("a"), lon2.alias("b")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, lat DOUBLE, lon DOUBLE, brg DOUBLE, d DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
    sa, sb = project_sql("lat", "lon", "brg", "d")
    by_i = {r[0]: r[1:] for r in rows}
    n_ulp_drift = 0
    for i, a, b in con.execute(f"SELECT i, {sa}, {sb} FROM t").fetchall():
        # DuckDB == scalar libm bit-for-bit (both bind glibc)
        pa, pb = project_py(*by_i[i])
        assert (pa, pb) == (a, b)
        # the JVM atan2 intrinsic drifts 1 ulp from libm on ~13% of
        # operands (measured); Spark must agree within that spread —
        # the driver gate absorbs it with round-6 (7 orders of margin)
        assert abs(got[i][0] - a) <= 4 * abs(a) * 2.3e-16
        assert abs(got[i][1] - b) <= 4 * abs(b) * 2.3e-16
        if got[i] != (a, b):
            n_ulp_drift += 1
    assert n_ulp_drift < len(rows) // 2  # drift is the exception, not the rule
