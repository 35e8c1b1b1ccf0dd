"""Spatiotemporal contact join vs a brute-force python oracle."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from activity_files_spark.functions.geo import haversine_m_py
from activity_files_spark.operators.contact import contact_join

RADIUS = 200.0
WINDOW = 900.0


def _mk_points(n: int = 400, users: int = 12):
    """Deterministic cloud around (40, -105): integer-derived lat/lon/t."""
    rows = []
    for i in range(n):
        rows.append(
            (
                i % users,  # user_id
                i,  # event_id
                1_700_000_000_000_000 + (i * 377_000_000) % (n * 190_000_000),
                40.0 + ((i * 61) % 257) * 0.000008,
                -105.0 - ((i * 97) % 263) * 0.000008,
            )
        )
    return rows


def _brute(rows, radius=RADIUS, window=WINDOW):
    out = set()
    for a, b in itertools.combinations(rows, 2):
        if a[0] == b[0]:
            continue
        if abs(a[2] - b[2]) > window * 1_000_000:
            continue
        if haversine_m_py(a[3], a[4], b[3], b[4]) > radius:
            continue
        ia, ib = (a[1], b[1]) if a[1] < b[1] else (b[1], a[1])
        out.add((min(a[0], b[0]), max(a[0], b[0]), ia, ib))
    return out


def test_contact_join_matches_brute(spark):
    rows = _mk_points()
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, t_us long, lat double, lon double"
    )
    got = {
        (r.user_a, r.user_b, r.id_a, r.id_b)
        for r in contact_join(df, RADIUS, WINDOW, z=16).collect()
    }
    want = _brute(rows)
    assert want, "fixture must actually produce contacts"
    assert got == want


def test_contact_join_boundary_inclusive(spark):
    # two users exactly WINDOW apart in time and ~RADIUS apart in space:
    # both predicates are inclusive, so the pair must survive
    la2 = 40.0 + (RADIUS / (math.radians(1.0) * 6371008.8))
    d = haversine_m_py(40.0, -105.0, la2, -105.0)
    rows = [
        (1, 0, 1_700_000_000_000_000, 40.0, -105.0),
        (2, 1, 1_700_000_000_000_000 + int(WINDOW * 1e6), la2, -105.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, t_us long, lat double, lon double"
    )
    out = contact_join(df, d + 1e-9, WINDOW, z=16).collect()
    assert len(out) == 1 and out[0].user_a == 1 and out[0].user_b == 2
    # one microsecond past the window -> gone
    rows[1] = (2, 1, rows[1][2] + 1, la2, -105.0)
    df2 = spark.createDataFrame(
        rows, "user_id long, event_id long, t_us long, lat double, lon double"
    )
    assert contact_join(df2, d + 1e-9, WINDOW, z=16).count() == 0


def test_contact_join_same_user_excluded(spark):
    rows = [
        (7, 0, 1_700_000_000_000_000, 40.0, -105.0),
        (7, 1, 1_700_000_000_000_000 + 1000, 40.0, -105.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, t_us long, lat double, lon double"
    )
    assert contact_join(df, RADIUS, WINDOW).count() == 0


def test_contact_join_no_duplicate_pairs_across_cells(spark):
    # a pair straddling a z=16 tile boundary must appear exactly once
    rows = _mk_points(200, users=5)
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, t_us long, lat double, lon double"
    )
    out = contact_join(df, RADIUS, WINDOW, z=16).groupBy("id_a", "id_b").count()
    assert out.where(F.col("count") > 1).count() == 0
