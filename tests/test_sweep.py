"""Rect-union sweep vs brute cell enumeration; overlap pairs vs brute."""

from __future__ import annotations

import pytest

from activity_files_spark.operators.sweep import rect_overlap_pairs, rect_union_sweep

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


def _brute_pairs(rects):
    out = {}
    for i in range(len(rects)):
        for j in range(i + 1, len(rects)):
            a, b = rects[i], rects[j]
            if a[0] > b[0]:
                a, b = b, a
            iw = min(a[3], b[3]) - max(a[1], b[1]) + 1
            ih = min(a[4], b[4]) - max(a[2], b[2]) + 1
            if iw > 0 and ih > 0:
                area_a = (a[3] - a[1] + 1) * (a[4] - a[2] + 1)
                area_b = (b[3] - b[1] + 1) * (b[4] - b[2] + 1)
                out[(a[0], b[0])] = (iw * ih, area_a, area_b)
    return out


@pytest.mark.parametrize("cell", [1, 4, 256, 100000])
def test_overlap_pairs_vs_brute(spark, cell):
    rects = [
        (1, 0, 0, 9, 9), (2, 5, 5, 14, 14), (3, 8, 0, 12, 3),
        (4, 20, 20, 25, 21), (5, 0, 0, 30, 30), (6, 7, 7, 7, 7),
        (7, 300, 300, 420, 310),  # spans a 256-cell boundary
        (8, 310, 305, 330, 400),
    ]
    df = spark.createDataFrame(rects, SCHEMA)
    rows = rect_overlap_pairs(df, cell=cell).collect()
    got = {
        (r.region_id_a, r.region_id_b): (r.inter_area, r.area_a, r.area_b)
        for r in rows
    }
    assert got == _brute_pairs(rects)
    for r in rows:
        assert r.union_area == r.area_a + r.area_b - r.inter_area
        assert r.jaccard == pytest.approx(r.inter_area / r.union_area)
    # exactly one row per pair (multi-cell candidates deduped)
    assert len(rows) == len(got)


def test_overlap_pairs_none(spark):
    rects = [(1, 0, 0, 3, 3), (2, 10, 10, 13, 13)]
    df = spark.createDataFrame(rects, SCHEMA)
    assert rect_overlap_pairs(df, cell=8).count() == 0


def test_overlap_pairs_bad_cell(spark):
    df = spark.createDataFrame([(1, 0, 0, 3, 3)], SCHEMA)
    with pytest.raises(ValueError):
        rect_overlap_pairs(df, cell=0)
