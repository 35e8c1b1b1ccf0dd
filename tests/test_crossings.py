"""Route-crossing join (operators/crossings.py): cover-join + strict
integer refine vs the O(n^2) definitional oracle, plus predicate twins."""

import random

import duckdb

from activity_files_spark.operators.crossings import (
    crossings_brute_py,
    proper_cross_py,
    proper_cross_sql,
    segment_crossings,
)

Q = 4  # 16 subunits/cell — small cells so covers actually collide


def _random_routes(n_routes, pts_per_route, seed, span=120):
    """Random-walk routes on the integer lattice; returns segment rows
    (key, seq, x0, y0, x1, y1)."""
    rng = random.Random(seed)
    segs = []
    for k in range(n_routes):
        x, y = rng.randint(-span, span), rng.randint(-span, span)
        for s in range(pts_per_route):
            nx = x + rng.randint(-40, 40)
            ny = y + rng.randint(-40, 40)
            segs.append((f"r{k}", s, x, y, nx, ny))
            x, y = nx, ny
    return segs


def test_predicate_hand_cases():
    # X crossing
    assert proper_cross_py((0, 0), (10, 10), (0, 10), (10, 0))
    # parallel
    assert not proper_cross_py((0, 0), (10, 0), (0, 5), (10, 5))
    # T-touch (endpoint ON the other segment) is NOT a proper crossing
    assert not proper_cross_py((0, 0), (10, 0), (5, 0), (5, 10))
    # collinear overlap excluded
    assert not proper_cross_py((0, 0), (10, 0), (5, 0), (15, 0))
    # shared endpoint excluded
    assert not proper_cross_py((0, 0), (10, 10), (10, 10), (20, 0))
    # degenerate zero-length never crosses
    assert not proper_cross_py((5, 5), (5, 5), (0, 0), (10, 10))


def test_sql_predicate_twin_matches_python():
    rng = random.Random(7)
    rows = [
        tuple(rng.randint(-30, 30) for _ in range(8)) for _ in range(4000)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(px BIGINT, py BIGINT, qx BIGINT, qy BIGINT,"
        " ax BIGINT, ay BIGINT, bx BIGINT, by BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?,?,?)", rows)
    pred = proper_cross_sql(
        ("px", "py"), ("qx", "qy"), ("ax", "ay"), ("bx", "by")
    )
    got = [r[0] for r in con.execute(f"SELECT {pred} FROM t").fetchall()]
    want = [
        proper_cross_py((r[0], r[1]), (r[2], r[3]), (r[4], r[5]), (r[6], r[7]))
        for r in rows
    ]
    assert got == want


def test_pipeline_matches_brute(spark):
    segs = _random_routes(6, 18, seed=11)
    df = spark.createDataFrame(
        segs, "key string, seq long, x0 long, y0 long, x1 long, y1 long"
    )
    got = {
        tuple(r)
        for r in segment_crossings(df, q=Q).collect()
    }
    want = crossings_brute_py(segs)
    assert got == want
    assert want  # the walk actually produces crossings


def test_pipeline_partitioning_invariant(spark):
    segs = _random_routes(5, 12, seed=23)
    df = spark.createDataFrame(
        segs, "key string, seq long, x0 long, y0 long, x1 long, y1 long"
    )
    a = sorted(tuple(r) for r in segment_crossings(df, q=Q).collect())
    b = sorted(
        tuple(r)
        for r in segment_crossings(df.repartition(13), q=Q).collect()
    )
    assert a == b


def test_same_route_pairs_excluded(spark):
    # a self-intersecting single route yields nothing (cross-route only)
    segs = [("r0", 0, 0, 0, 10, 10), ("r0", 1, 0, 10, 10, 0)]
    df = spark.createDataFrame(
        segs, "key string, seq long, x0 long, y0 long, x1 long, y1 long"
    )
    assert segment_crossings(df, q=Q).count() == 0


def test_self_intersections_match_brute(spark):
    from activity_files_spark.operators.crossings import (
        self_intersections,
        self_intersections_brute_py,
    )

    segs = _random_routes(5, 24, seed=31)
    df = spark.createDataFrame(
        segs, "key string, seq long, x0 long, y0 long, x1 long, y1 long"
    )
    got = {tuple(r) for r in self_intersections(df, q=Q).collect()}
    want = self_intersections_brute_py(segs)
    assert got == want
    assert want  # random walks do self-cross


def test_simple_polyline_has_no_self_intersections(spark):
    # a monotone staircase is simple
    segs = [("r", s, s * 10, s * 7, (s + 1) * 10, (s + 1) * 7) for s in range(10)]
    from activity_files_spark.operators.crossings import self_intersections

    df = spark.createDataFrame(
        segs, "key string, seq long, x0 long, y0 long, x1 long, y1 long"
    )
    assert self_intersections(df, q=Q).count() == 0


def _point_py(a, b):
    """Exact rational intersection of proper crossing (fractions twin)."""
    from fractions import Fraction

    (pax, pay, pbx, pby) = a
    (qax, qay, qbx, qby) = b
    d1x, d1y = pbx - pax, pby - pay
    d2x, d2y = qbx - qax, qby - qay
    den = d1x * d2y - d1y * d2x
    t = Fraction((qax - pax) * d2y - (qay - pay) * d2x, den)
    return (pax + t * d1x, pay + t * d1y)


def test_crossing_points_known_case(spark):
    segs = [
        ("a", 0, 0, 0, 10, 10),   # (0,0)->(10,10)
        ("b", 0, 0, 10, 10, 0),   # (0,10)->(10,0) : crosses at (5,5)
    ]
    df = spark.createDataFrame(
        segs, "key string, seq long, x0 long, y0 long, x1 long, y1 long"
    )
    rows = segment_crossings(df, q=Q, with_points=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.den > 0
    assert int(r.px_num) / r.den == 5.0 and int(r.py_num) / r.den == 5.0


def test_crossing_points_match_fraction_twin(spark):
    from fractions import Fraction

    segs = _random_routes(6, 18, seed=23)
    df = spark.createDataFrame(
        segs, "key string, seq long, x0 long, y0 long, x1 long, y1 long"
    )
    rows = segment_crossings(df, q=Q, with_points=True).collect()
    assert rows
    by_seg = {(k, s): (x0, y0, x1, y1) for k, s, x0, y0, x1, y1 in segs}
    for r in rows:
        a = by_seg[(r.key_a, r.seq_a)]
        b = by_seg[(r.key_b, r.seq_b)]
        X, Y = _point_py(a, b)
        assert Fraction(int(r.px_num), r.den) == X
        assert Fraction(int(r.py_num), r.den) == Y
        assert r.den > 0
        # properness: strictly interior on both segments
        assert min(a[0], a[2]) <= X <= max(a[0], a[2])
