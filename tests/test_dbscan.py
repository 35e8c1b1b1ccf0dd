"""DBSCAN operator (operators/dbscan.py) vs a brute-force python
reference implementing the same deterministic variant (min-label
clusters, min-cluster border attach)."""

import math

import pytest

from activity_files_spark.functions.geo import haversine_m_py
from activity_files_spark.operators.dbscan import cell_sizes_deg, dbscan


def _brute_dbscan(pts, eps_m, min_pts):
    """pts: list[(id, lat, lon)] -> {id: (role, cluster)} with the module's
    deterministic semantics."""
    ids = [p[0] for p in pts]
    loc = {p[0]: (p[1], p[2]) for p in pts}
    nbrs = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i != j and haversine_m_py(*loc[i], *loc[j]) <= eps_m:
                nbrs[i].add(j)
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    # components over core-core edges, label = min core id reachable
    label = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in nbrs[i]:
                if j in core and label[j] < label[i]:
                    label[i] = label[j]
                    changed = True
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", label[i])
        else:
            cand = [label[j] for j in nbrs[i] if j in core]
            if cand:
                out[i] = ("border", min(cand))
            else:
                out[i] = ("noise", -1)
    return out


def _run(spark, pts, eps_m, min_pts, max_lat=52.0):
    df = spark.createDataFrame(pts, ["point_id", "lat", "lon"])
    rows = dbscan(df, eps_m, min_pts, max_abs_lat_deg=max_lat).collect()
    return {r["point_id"]: (r["role"], r["cluster"]) for r in rows}


def test_dbscan_hand_case(spark):
    # two tight 4-point squares ~2km apart + one isolated point; at
    # eps=200m / min_pts=3 each square is one all-core cluster, the
    # straggler 150m off square A is a border, the isolated point noise
    d = 0.001  # ~111m lat
    a = [(1, 50.0, 8.0), (2, 50.0 + d, 8.0), (3, 50.0, 8.0 + d), (4, 50.0 + d, 8.0 + d)]
    b = [(11, 50.02, 8.0), (12, 50.02 + d, 8.0), (13, 50.02, 8.0 + d), (14, 50.02 + d, 8.0 + d)]
    # ~187m from point 1 and >200m from every other square point: exactly
    # one core neighbor -> border
    straggler = [(21, 50.0 - 0.0016, 8.0 - 0.0008)]
    lone = [(31, 50.5, 8.5)]
    got = _run(spark, a + b + straggler + lone, 200.0, 3)
    assert got == _brute_dbscan(a + b + straggler + lone, 200.0, 3)
    assert got[1] == ("core", 1) and got[14] == ("core", 11)
    assert got[21][0] == "border" and got[21][1] == 1
    assert got[31] == ("noise", -1)


def test_dbscan_random_matches_brute(spark):
    import random

    rng = random.Random(1234)
    pts = [
        (i, 47.0 + rng.random() * 0.02, 11.0 + rng.random() * 0.02)
        for i in range(120)
    ]
    for eps, mp in ((250.0, 4), (120.0, 3)):
        got = _run(spark, pts, eps, mp)
        want = _brute_dbscan(pts, eps, mp)
        assert got == want
        roles = {r for r, _ in want.values()}
        assert roles == {"core", "border", "noise"} or len(roles) >= 2


def test_cell_sizes_cover_eps():
    # the 3x3 neighborhood covers the eps ball: cell side >= eps meters
    # at every latitude in the band
    for eps in (50.0, 500.0, 5000.0):
        for band in (0.0, 40.0, 60.0):
            dlat, dlon = cell_sizes_deg(eps, band)
            assert dlat * 110574.0 >= eps - 1e-9
            # worst-case longitude shrink inside the band
            assert dlon * 111320.0 * math.cos(math.radians(band)) >= eps - 1e-9
    with pytest.raises(ValueError):
        cell_sizes_deg(100.0, 89.5)
