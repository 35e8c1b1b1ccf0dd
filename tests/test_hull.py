"""Convex hull operator (operators/hull.py) vs a definitional O(n^3)
python check, plus the DuckDB oracle twin on general-position inputs."""

import math
import random

import duckdb

from activity_files_spark.operators.hull import (
    convex_hull,
    convex_hull_py,
    convex_hull_sql,
)


def _cross(a, b, p):
    return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])


def _hull_by_definition(pts):
    """Hull vertex tags via the edge definition: (a,b) is an edge iff all
    other points are strictly left of a->b."""
    verts = set()
    for a in pts:
        for b in pts:
            if a[2] == b[2]:
                continue
            if all(
                _cross(a, b, p) > 0.0 for p in pts if p[2] not in (a[2], b[2])
            ):
                verts.add(a[2])
                verts.add(b[2])
    return verts


def _spiral(uid, n, jitter=0.0):
    rng = random.Random(uid * 31)
    pts = []
    for s in range(1, n + 1):
        r = 0.001 * s + jitter * rng.random()
        pts.append(
            (11.0 + r * math.cos(s * 0.7), 47.0 + r * math.sin(s * 0.7), s)
        )
    return pts


def test_chain_matches_definition():
    for uid, n in ((1, 30), (2, 7), (3, 80)):
        pts = _spiral(uid, n, jitter=0.0004)
        chain = convex_hull_py(pts)
        assert set(chain) == _hull_by_definition(pts)
        # counterclockwise: shoelace area positive
        loc = {t: (x, y) for x, y, t in pts}
        ring = [loc[t] for t in chain]
        area = sum(
            ring[i][0] * ring[(i + 1) % len(ring)][1]
            - ring[(i + 1) % len(ring)][0] * ring[i][1]
            for i in range(len(ring))
        )
        assert area > 0.0
        # starts at the lexicographic minimum
        assert loc[chain[0]] == min(ring)


def test_hull_spark_and_sql_twin(spark):
    rows = []
    for uid in (1, 2, 3):
        for x, y, s in _spiral(uid, 40, jitter=0.0004):
            rows.append((uid, s, x, y))
    df = spark.createDataFrame(rows, ["user_id", "seq", "lon", "lat"])
    got = sorted(tuple(r) for r in convex_hull(df).collect())

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts(user_id BIGINT, seq BIGINT, lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO pts VALUES (?,?,?,?)", rows)
    body = convex_hull_sql("pts")
    q = f"WITH {body} SELECT key AS user_id, seq, hull_order FROM ch_verts"
    want = sorted(tuple(r) for r in con.execute(q).fetchall())
    assert got == want


def test_hull_degenerate_small(spark):
    # fewer than 3 points: all points are the hull
    df = spark.createDataFrame(
        [(9, 1, 11.0, 47.0), (9, 2, 11.5, 47.5)],
        ["user_id", "seq", "lon", "lat"],
    )
    got = sorted((r["seq"], r["hull_order"]) for r in convex_hull(df).collect())
    assert got == [(1, 0), (2, 1)]
