"""Douglas-Peucker simplification: numpy kernel vs an independent recursive
python implementation, the epsilon invariant, degenerate tracks, the
DuckDB recursive-CTE oracle, and the Spark operator end-to-end."""

import collections

import duckdb
import numpy as np
import pytest

from activity_files_spark.operators.simplify import (
    _dp_keep_mask,
    simplify_sql,
    simplify_tracks,
)
from activity_files_spark.operators.spatial import planar_scales

REF_LAT = 40.25
KX, KY = planar_scales(REF_LAT)


def _seg_dist(p, a, b):
    wx = (p[1] - a[1]) * KX
    wy = (p[0] - a[0]) * KY
    vx = (b[1] - a[1]) * KX
    vy = (b[0] - a[0]) * KY
    len2 = vx * vx + vy * vy
    if len2 == 0.0:
        len2, vx, vy = 1.0, 0.0, 0.0
    t = min(max((wx * vx + wy * vy) / len2, 0.0), 1.0)
    dx, dy = wx - t * vx, wy - t * vy
    return (dx * dx + dy * dy) ** 0.5


def _dp_recursive(pts, eps):
    """Independent recursive implementation (the textbook form)."""
    n = len(pts)
    if n <= 2:
        return set(range(n))
    keep = {0, n - 1}

    def rec(i, j):
        if j - i < 2:
            return
        dmax, kmax = -1.0, None
        for k in range(i + 1, j):
            d = _seg_dist(pts[k], pts[i], pts[j])
            if d > dmax:  # strict > keeps the FIRST max -> min seq tiebreak
                dmax, kmax = d, k
        if dmax > eps:
            keep.add(kmax)
            rec(i, kmax)
            rec(kmax, j)

    rec(0, n - 1)
    return keep


def _tracks(rng, n_users=5):
    out = {}
    for u in range(n_users):
        n = rng.randint(1, 80)
        seqs = np.arange(n)
        lat = 40.0 + seqs * 0.0005 + rng.normal(0, 0.0005, n)
        lon = -105.0 + 0.015 * np.sin(seqs * 0.07) + rng.normal(0, 0.0005, n)
        out[u] = list(zip(lat.tolist(), lon.tolist()))
    out[90] = [(40.0, -105.0)]                       # single point
    out[91] = [(40.0, -105.0), (40.0, -105.0)]       # duplicate pair
    out[92] = [(40.0, -105.0)] * 6                   # zero-length chords
    out[93] = [(40.0, -105.0), (40.3, -105.0), (40.0, -105.0)]  # out-and-back
    return out


def test_kernel_matches_recursive_reference():
    rng = np.random.RandomState(7)
    tracks = _tracks(rng)
    for eps in (30.0, 150.0, 1e7):
        for u, pts in tracks.items():
            lat = np.array([p[0] for p in pts])
            lon = np.array([p[1] for p in pts])
            mask = _dp_keep_mask(lat, lon, eps, KX, KY)
            got = {i for i in range(len(pts)) if mask[i]}
            assert got == _dp_recursive(pts, eps), (u, eps)


def test_epsilon_invariant():
    """Every dropped point is within eps of the simplified polyline."""
    rng = np.random.RandomState(11)
    for u, pts in _tracks(rng).items():
        lat = np.array([p[0] for p in pts])
        lon = np.array([p[1] for p in pts])
        eps = 100.0
        mask = _dp_keep_mask(lat, lon, eps, KX, KY)
        kept = [i for i in range(len(pts)) if mask[i]]
        for i in range(len(pts)):
            if mask[i]:
                continue
            # distance to the simplified chain's bracketing segment
            import bisect

            j = bisect.bisect_left(kept, i)
            a, b = kept[j - 1], kept[j]
            assert _seg_dist(pts[i], pts[a], pts[b]) <= eps + 1e-9


def test_duckdb_oracle_parity():
    rng = np.random.RandomState(23)
    tracks = _tracks(rng)
    rows = [
        (u, s, p[0], p[1])
        for u, pts in tracks.items()
        for s, p in enumerate(pts)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE raw(user_id INT, seq INT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO raw VALUES (?,?,?,?)", rows)
    eps = 120.0
    body = simplify_sql("pts", eps, REF_LAT, key="user_id")
    got = collections.defaultdict(set)
    for k, s in con.sql(
        f"WITH RECURSIVE pts AS (SELECT * FROM raw),\n{body}\n"
        "SELECT key, seq FROM dp_kept"
    ).fetchall():
        got[k].add(s)
    for u, pts in tracks.items():
        lat = np.array([p[0] for p in pts])
        lon = np.array([p[1] for p in pts])
        mask = _dp_keep_mask(lat, lon, eps, KX, KY)
        assert got[u] == {i for i in range(len(pts)) if mask[i]}, u
    # no duplicate kept rows (the DISTINCT-over-UNION-ALL guard)
    n_rows = con.sql(
        f"WITH RECURSIVE pts AS (SELECT * FROM raw),\n{body}\n"
        "SELECT COUNT(*) FROM dp_kept"
    ).fetchone()[0]
    assert n_rows == sum(len(v) for v in got.values())


def test_spark_operator_matches_kernel(spark):
    rng = np.random.RandomState(31)
    tracks = _tracks(rng)
    rows = [
        (str(u), s, p[0], p[1])
        for u, pts in tracks.items()
        for s, p in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "activity_id string, seq long, lat double, lon double"
    )
    kept = simplify_tracks(df, 80.0, REF_LAT)
    got = collections.defaultdict(set)
    for r in kept.collect():
        got[r["activity_id"]].add(r["seq"])
    for u, pts in tracks.items():
        lat = np.array([p[0] for p in pts])
        lon = np.array([p[1] for p in pts])
        mask = _dp_keep_mask(lat, lon, 80.0, KX, KY)
        assert got[str(u)] == {i for i in range(len(pts)) if mask[i]}, u
