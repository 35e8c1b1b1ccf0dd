"""Rect-union sweep vs brute cell enumeration."""

from __future__ import annotations

from activity_files_spark.operators.sweep import rect_union_sweep

SCHEMA = "region_id long, ax long, ay long, bx long, by long"


def _brute_area(rects):
    cells = set()
    for _, ax, ay, bx, by in rects:
        for x in range(ax, bx + 1):
            for y in range(ay, by + 1):
                cells.add((x, y))
    return len(cells)


def _check(spark, rects):
    df = spark.createDataFrame(rects, SCHEMA)
    out = rect_union_sweep(df).collect()
    got = sum(r.area for r in out)
    assert got == _brute_area(rects)
    # strips tile the x extent without gaps or overlap
    strips = sorted((r.x_lo, r.x_hi) for r in out)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(strips, strips[1:]):
        assert a_hi <= b_lo
    # per-strip covered length is the brute distinct-y count at x_lo
    for r in out:
        ys = set()
        for _, ax, ay, bx, by in rects:
            if ax <= r.x_lo <= bx:
                ys.update(range(ay, by + 1))
        assert r.y_covered == len(ys)
        assert r.area == (r.x_hi - r.x_lo) * len(ys)


def test_overlapping_rects(spark):
    _check(
        spark,
        [(1, 0, 0, 9, 9), (2, 5, 5, 14, 14), (3, 8, 0, 12, 3), (4, 20, 20, 25, 21)],
    )


def test_nested_and_duplicate_rects(spark):
    _check(spark, [(1, 0, 0, 20, 20), (2, 5, 5, 10, 10), (3, 0, 0, 20, 20)])


def test_disjoint_rects(spark):
    _check(spark, [(1, 0, 0, 3, 3), (2, 10, 10, 13, 13)])


def test_single_cell_rect(spark):
    _check(spark, [(1, 7, 7, 7, 7)])
