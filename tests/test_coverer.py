"""Hierarchical region coverer (operators/coverer.py): exact-partition,
minimality, and three-engine parity."""

import random

import duckdb

from activity_files_spark.operators.coverer import (
    region_quad_cover,
    region_quad_cover_py,
    region_quad_cover_sql,
)

Z0, ZMAX = 3, 9


def _random_rects(n, seed, world=None):
    world = world or (1 << ZMAX)
    rng = random.Random(seed)
    out = []
    for k in range(n):
        ax = rng.randint(0, world - 2)
        ay = rng.randint(0, world - 2)
        bx = rng.randint(ax, world - 1)
        by = rng.randint(ay, world - 1)
        out.append((k, ax, ay, bx, by))
    return out


def test_python_cover_is_exact_partition():
    for k, ax, ay, bx, by in _random_rects(25, seed=3):
        cover = region_quad_cover_py(ax, ay, bx, by, Z0, ZMAX)
        # area identity: sum of 4^(zmax-z) == rect area in zmax cells
        area = sum(4 ** (ZMAX - z) for z, _, _ in cover)
        assert area == (bx - ax + 1) * (by - ay + 1)
        # expansion to zmax cells is disjoint and equals the rect exactly
        seen = set()
        for z, cx, cy in cover:
            sh = ZMAX - z
            for fx in range(cx << sh, (cx + 1) << sh):
                for fy in range(cy << sh, (cy + 1) << sh):
                    assert (fx, fy) not in seen
                    seen.add((fx, fy))
                    assert ax <= fx <= bx and ay <= fy <= by
        assert len(seen) == area


def test_python_cover_is_minimal():
    # no emitted cell has all 3 siblings emitted at the same level
    # (their parent would have been fully inside and emitted instead)
    for k, ax, ay, bx, by in _random_rects(25, seed=5):
        cover = region_quad_cover_py(ax, ay, bx, by, Z0, ZMAX)
        by_level = {}
        for z, cx, cy in cover:
            by_level.setdefault(z, set()).add((cx, cy))
        for z, cells in by_level.items():
            if z == Z0:
                continue
            for cx, cy in cells:
                px, py = cx & ~1, cy & ~1
                quartet = {
                    (px, py), (px + 1, py), (px, py + 1), (px + 1, py + 1)
                }
                assert not quartet <= cells, (z, cx, cy)


def test_spark_matches_python(spark):
    rects = _random_rects(12, seed=11)
    df = spark.createDataFrame(
        rects, "region_id long, ax long, ay long, bx long, by long"
    )
    got = {}
    for r in region_quad_cover(df, Z0, ZMAX, key="region_id").collect():
        got.setdefault(r["key"], set()).add((r["level"], r["cx"], r["cy"]))
    for k, ax, ay, bx, by in rects:
        assert got.get(k, set()) == region_quad_cover_py(ax, ay, bx, by, Z0, ZMAX)


def test_sql_twin_matches_python():
    rects = _random_rects(12, seed=17)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE rects(region_id BIGINT, ax BIGINT, ay BIGINT,"
        " bx BIGINT, by BIGINT)"
    )
    con.executemany("INSERT INTO rects VALUES (?,?,?,?,?)", rects)
    body, final = region_quad_cover_sql("rects", Z0, ZMAX, key="region_id")
    rows = con.execute(
        f"WITH {body} SELECT key, level, cx, cy FROM {final}"
    ).fetchall()
    got = {}
    for k, z, cx, cy in rows:
        got.setdefault(k, set()).add((z, cx, cy))
    for k, ax, ay, bx, by in rects:
        assert got.get(k, set()) == region_quad_cover_py(ax, ay, bx, by, Z0, ZMAX)


def test_degenerate_single_cell(spark):
    df = spark.createDataFrame(
        [(0, 5, 7, 5, 7)], "region_id long, ax long, ay long, bx long, by long"
    )
    rows = region_quad_cover(df, Z0, ZMAX, key="region_id").collect()
    assert [(r["level"], r["cx"], r["cy"]) for r in rows] == [(ZMAX, 5, 7)]


def test_full_world_is_four_top_cells(spark):
    w = 1 << ZMAX
    df = spark.createDataFrame(
        [(0, 0, 0, w - 1, w - 1)],
        "region_id long, ax long, ay long, bx long, by long",
    )
    rows = region_quad_cover(df, Z0, ZMAX, key="region_id").collect()
    assert sorted((r["level"], r["cx"], r["cy"]) for r in rows) == [
        (Z0, cx, cy) for cx in range(1 << Z0) for cy in range(1 << Z0)
    ]
