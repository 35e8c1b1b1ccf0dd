"""Track densification (operators/densify.py): python/SQL/Spark parity,
spacing bound, and vertex-preservation invariants."""

import random

import duckdb

from activity_files_spark.operators.densify import (
    densify_py,
    densify_sql,
    densify_tracks,
)

K = 16


def _routes(n_routes, pts, seed, span=1000):
    rng = random.Random(seed)
    rows = []
    for r in range(n_routes):
        for s in range(pts):
            lat = rng.uniform(-60, 60)
            lon = rng.uniform(-170, 170)
            # lattice twins: deterministic ints derived independently so the
            # test covers the operator, not the mercator transform
            x = rng.randint(-span, span)
            y = rng.randint(-span, span)
            rows.append((f"r{r}", s, lat, lon, x, y))
    return rows


def test_python_spacing_and_vertices():
    rng = random.Random(1)
    pts = [
        (rng.uniform(0, 1), rng.uniform(0, 1), rng.randint(0, 500), rng.randint(0, 500))
        for _ in range(20)
    ]
    out = densify_py(pts, K)
    # original vertices survive in order; last point present exactly once
    assert out[-1] == (pts[-1][0], pts[-1][1])
    orig = [(p[0], p[1]) for p in pts]
    idx = [out.index(v) for v in orig]
    assert idx == sorted(idx)
    # split counts honour the chebyshev bound
    j = 0
    for a, b in zip(pts, pts[1:]):
        cheb = max(abs(b[2] - a[2]), abs(b[3] - a[3]))
        n = max(-(-cheb // K), 1)
        j += n
    assert len(out) == j + 1


def test_spark_matches_python(spark):
    rows = _routes(4, 12, seed=7)
    df = spark.createDataFrame(
        rows, "key string, seq long, lat double, lon double, x long, y long"
    )
    got = {}
    for r in densify_tracks(df, K, key="key").collect():
        got.setdefault(r["key"], []).append((r["seq"], r["i"], r["lat"], r["lon"]))
    for key in got:
        got[key].sort()
    by_key = {}
    for k, s, lat, lon, x, y in rows:
        by_key.setdefault(k, []).append((lat, lon, x, y))
    for k, pts in by_key.items():
        want = densify_py(pts, K)
        have = [(lat, lon) for _, _, lat, lon in got[k]]
        assert have == want, k  # bit-identical lerp


def test_sql_twin_matches_python():
    rows = _routes(4, 12, seed=13)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts(key VARCHAR, seq BIGINT, lat DOUBLE, lon DOUBLE,"
        " x BIGINT, y BIGINT)"
    )
    con.executemany("INSERT INTO pts VALUES (?,?,?,?,?,?)", rows)
    body, final = densify_sql("pts", K, key="key")
    out = con.execute(
        f"WITH {body} SELECT key, seq, i, lat, lon FROM {final}"
        " ORDER BY key, seq, i"
    ).fetchall()
    got = {}
    for k, s, i, lat, lon in out:
        got.setdefault(k, []).append((lat, lon))
    by_key = {}
    for k, s, lat, lon, x, y in rows:
        by_key.setdefault(k, []).append((lat, lon, x, y))
    for k, pts in by_key.items():
        assert got[k] == densify_py(pts, K), k


def test_zero_length_segment_keeps_one_vertex(spark):
    rows = [("r", 0, 1.0, 2.0, 5, 5), ("r", 1, 1.0, 2.0, 5, 5)]
    df = spark.createDataFrame(
        rows, "key string, seq long, lat double, lon double, x long, y long"
    )
    out = sorted(
        (r["seq"], r["i"]) for r in densify_tracks(df, K, key="key").collect()
    )
    assert out == [(0, 0), (1, 0)]


def test_line_interpolate_matches_python(spark):
    from activity_files_spark.operators.densify import (
        line_interpolate_points,
        line_interpolate_py,
        line_interpolate_sql,
    )

    fracs = [(1, 4), (1, 2), (3, 4)]
    rows = _routes(5, 10, seed=21)
    df = spark.createDataFrame(
        rows, "key string, seq long, lat double, lon double, x long, y long"
    )
    got = {
        (r["key"], r["num"], r["den"]): (r["seq"], r["lat"], r["lon"])
        for r in line_interpolate_points(df, fracs, key="key").collect()
    }
    by_key = {}
    for k, s, lat, lon, x, y in rows:
        by_key.setdefault(k, []).append((lat, lon, x, y))
    want = {}
    for k, pts in by_key.items():
        for (num, den), v in line_interpolate_py(pts, fracs).items():
            want[(k, num, den)] = v
    assert got == want  # seq and bit-identical lerp

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts(key VARCHAR, seq BIGINT, lat DOUBLE, lon DOUBLE,"
        " x BIGINT, y BIGINT)"
    )
    con.executemany("INSERT INTO pts VALUES (?,?,?,?,?,?)", rows)
    body, final = line_interpolate_sql("pts", fracs, key="key")
    sql_got = {
        (r[0], r[1], r[2]): (r[3], r[4], r[5])
        for r in con.execute(
            f"WITH {body} SELECT key, num, den, seq, lat, lon FROM {final}"
        ).fetchall()
    }
    assert sql_got == want


def test_line_interpolate_midpoint_of_straight_line(spark):
    from activity_files_spark.operators.densify import line_interpolate_py

    pts = [(0.0, 0.0, 0, 0), (10.0, 20.0, 100, 200)]
    out = line_interpolate_py(pts, [(1, 2)])
    seq, lat, lon = out[(1, 2)]
    assert (seq, lat, lon) == (1, 5.0, 10.0)


def test_line_interpolate_zero_length_route_is_empty():
    from activity_files_spark.operators.densify import line_interpolate_py

    assert line_interpolate_py([(1.0, 2.0, 5, 5), (1.0, 2.0, 5, 5)], [(1, 2)]) == {}
