"""Segment supercover (operators/supercover.py): enumeration vs the
definitional closed-box intersection oracle, and three-engine parity."""

import random

import duckdb
import pandas as pd

from activity_files_spark.operators.supercover import (
    brute_cover_py,
    segment_cell_cover,
    segment_cell_cover_py,
    segment_cover_sql,
)

Q = 4  # 16 subunits/cell in tests — small so corner hits actually occur


def _random_segments(n, seed, span=200, neg=True):
    rng = random.Random(seed)
    lo = -span if neg else 0
    return [
        (
            k,
            rng.randint(lo, span),
            rng.randint(lo, span),
            rng.randint(lo, span),
            rng.randint(lo, span),
        )
        for k in range(n)
    ]


def test_enumeration_matches_brute():
    for k, x0, y0, x1, y1 in _random_segments(400, seed=3):
        got = segment_cell_cover_py(x0, y0, x1, y1, q=Q)
        exp = brute_cover_py(x0, y0, x1, y1, q=Q)
        assert got == exp, (x0, y0, x1, y1, got ^ exp)


def test_enumeration_hand_cases():
    s = 1 << Q
    # point
    assert segment_cell_cover_py(5, 5, 5, 5, q=Q) == {(0, 0)}
    # point exactly on a lattice corner touches all 4 closed boxes
    assert segment_cell_cover_py(s, s, s, s, q=Q) == {
        (0, 0),
        (0, 1),
        (1, 0),
        (1, 1),
    }
    assert segment_cell_cover_py(s, s, s, s, q=Q) == brute_cover_py(
        s, s, s, s, q=Q
    )
    # endpoint on a vertical boundary (not corner) touches both columns
    assert segment_cell_cover_py(s, 5, s + 3, 5, q=Q) == brute_cover_py(
        s, 5, s + 3, 5, q=Q
    )
    # horizontal through 3 cells
    assert segment_cell_cover_py(1, 1, 3 * s - 1, 1, q=Q) == {
        (0, 0),
        (1, 0),
        (2, 0),
    }
    # exact diagonal through the shared corner of 4 cells
    got = segment_cell_cover_py(1, 1, 2 * s - 1, 2 * s - 1, q=Q)
    assert (1, 0) in got and (0, 1) in got  # corner supercover cells
    assert got == brute_cover_py(1, 1, 2 * s - 1, 2 * s - 1, q=Q)
    # segment lying exactly ON a horizontal grid line covers both rows
    got = segment_cell_cover_py(1, s, 2 * s - 1, s, q=Q)
    assert got == brute_cover_py(1, s, 2 * s - 1, s, q=Q)
    assert (0, 0) in got and (0, 1) in got


def test_negative_coordinates_boundary():
    """floor/mod conventions hold below zero (truncating ``%`` only feeds
    divisibility tests; _fdiv is a real floor)."""
    s = 1 << Q
    for case in [(-1, -1, -3 * s, -2 * s), (-s, 0, s, 0), (-s, -s, -s, -s)]:
        assert segment_cell_cover_py(*case, q=Q) == brute_cover_py(*case, q=Q)


def test_spark_matches_py(spark):
    segs = _random_segments(250, seed=11)
    sdf = spark.createDataFrame(
        segs, "key long, x0 long, y0 long, x1 long, y1 long"
    )
    out = segment_cell_cover(sdf, q=Q, key="key")
    got = {}
    for r in out.collect():
        got.setdefault(r["key"], set()).add((r["cx"], r["cy"]))
    for k, x0, y0, x1, y1 in segs:
        assert got[k] == segment_cell_cover_py(x0, y0, x1, y1, q=Q), (
            k,
            x0,
            y0,
            x1,
            y1,
        )


def test_duckdb_matches_py():
    segs = _random_segments(250, seed=17)
    df = pd.DataFrame(segs, columns=["key", "x0", "y0", "x1", "y1"])
    ctes, final = segment_cover_sql("segs", Q, key="key")
    rows = duckdb.sql(
        f"WITH segs AS (SELECT * FROM df),\n    {ctes} "
        f"SELECT key, cx, cy FROM {final}"
    ).fetchall()
    got = {}
    for k, cx, cy in rows:
        got.setdefault(k, set()).add((cx, cy))
    for k, x0, y0, x1, y1 in segs:
        assert got[k] == segment_cell_cover_py(x0, y0, x1, y1, q=Q)


def test_per_key_dedup(spark):
    # two segments of one key sharing cells -> set semantics per key
    sdf = spark.createDataFrame(
        [(7, 0, 0, 30, 0), (7, 0, 0, 0, 30)],
        "key long, x0 long, y0 long, x1 long, y1 long",
    )
    rows = segment_cell_cover(sdf, q=Q, key="key").collect()
    cells = {(r["cx"], r["cy"]) for r in rows}
    assert len(rows) == len(cells)
    exp = segment_cell_cover_py(0, 0, 30, 0, q=Q) | segment_cell_cover_py(
        0, 0, 0, 30, q=Q
    )
    assert cells == exp
