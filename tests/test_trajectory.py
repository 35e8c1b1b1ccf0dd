"""Trajectory similarity: cell signatures, exact pair Jaccard, top-k
selection determinism, and the cell-snapped symmetric Hausdorff refine
against a pure-python oracle."""

import math

import pytest
from pyspark.sql import functions as F

from activity_files_spark.functions.geo import haversine_m_py
from activity_files_spark.functions.quadkey import tile_xy_py
from activity_files_spark.operators.trajectory import (
    hausdorff_refine,
    route_cells,
    route_pair_jaccard,
    top_similar_routes,
)

Z = 13


def _track(lat0, lon0, n, dlat, dlon):
    return [(lat0 + i * dlat, lon0 + i * dlon) for i in range(n)]


ROUTES = {
    # two near-identical diagonals, one shifted copy, one far away
    "a": _track(40.00, -105.00, 30, 0.004, 0.004),
    "b": _track(40.001, -105.001, 30, 0.004, 0.004),   # ~a with tiny offset
    "c": _track(40.06, -105.06, 30, 0.004, 0.004),     # overlaps a's tail
    "d": _track(42.00, -100.00, 10, 0.004, 0.004),     # disjoint cells
}


def _cells_py(pts):
    return {tile_xy_py(lat, lon, Z) for lat, lon in pts}


def _center_py(cx, cy):
    n = float(1 << Z)
    lon = (cx + 0.5) / n * 360.0 - 180.0
    targ = math.pi * (1.0 - 2.0 * (cy + 0.5) / n)
    lat = math.atan((math.exp(targ) - math.exp(-targ)) / 2.0) * (180.0 / math.pi)
    return lat, lon


def _hausdorff_py(ca, cb):
    def directed(xs, ys):
        return max(
            min(haversine_m_py(*_center_py(*x), *_center_py(*y)) for y in ys)
            for x in xs
        )
    return max(directed(ca, cb), directed(cb, ca))


@pytest.fixture(scope="module")
def points_df(spark):
    rows = [(k, lat, lon) for k, pts in ROUTES.items() for lat, lon in pts]
    return spark.createDataFrame(rows, "user_id string, lat double, lon double")


def test_route_cells_match_python(points_df):
    cells = route_cells(points_df, Z)
    got = {}
    for r in cells.collect():
        got.setdefault(r["user_id"], set()).add((r["cx"], r["cy"]))
    assert got == {k: _cells_py(v) for k, v in ROUTES.items()}


def test_pair_jaccard_exact(points_df):
    cells = route_cells(points_df, Z)
    pairs = {(r["key_a"], r["key_b"]): r for r in route_pair_jaccard(cells).collect()}
    py = {k: _cells_py(v) for k, v in ROUTES.items()}
    expect = {}
    keys = sorted(ROUTES)
    for i, ka in enumerate(keys):
        for kb in keys[i + 1:]:
            s = len(py[ka] & py[kb])
            if s:
                expect[(ka, kb)] = (s, s / len(py[ka] | py[kb]))
    assert set(pairs) == set(expect)
    for k, (s, j) in expect.items():
        assert pairs[k]["n_shared"] == s
        assert pairs[k]["jaccard"] == pytest.approx(j, abs=0)
    # 'd' shares no cells with anyone
    assert not any("d" in k for k in pairs)


def test_top_similar_and_hausdorff_match_python(points_df):
    cells = route_cells(points_df, Z)
    pairs = route_pair_jaccard(cells)
    top = top_similar_routes(pairs, k=1).drop("rank")
    ref = {
        (r["key"], r["other"]): r["hausdorff_m"]
        for r in hausdorff_refine(top, cells, Z).collect()
    }
    py = {k: _cells_py(v) for k, v in ROUTES.items()}
    # a and b are each other's best match; every hausdorff matches python
    got_best = {k: o for (k, o) in ref}
    assert got_best["a"] == "b" and got_best["b"] == "a"
    assert "d" not in got_best  # no shared cells -> no candidates at all
    for (k, o), h in ref.items():
        assert h == pytest.approx(_hausdorff_py(py[k], py[o]), rel=1e-12)
    # identical signatures => hausdorff 0
    if py["a"] == py["b"]:
        assert ref[("a", "b")] == 0.0


def test_topk_tiebreak_deterministic(spark):
    # two candidates with IDENTICAL jaccard -> lower other-id wins rank 1
    rows = [
        ("x", "m", 2, 0.5), ("x", "k", 2, 0.5), ("x", "z", 1, 0.25),
    ]
    pairs = spark.createDataFrame(
        rows, "key_a string, key_b string, n_shared long, jaccard double"
    )
    top = top_similar_routes(pairs, k=1)
    row = [r for r in top.collect() if r["key"] == "x"]
    assert len(row) == 1 and row[0]["other"] == "k"
