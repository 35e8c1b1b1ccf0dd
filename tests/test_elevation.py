"""Hysteresis elevation gain vs a hand-rolled python oracle."""

from __future__ import annotations

from activity_files_spark.operators.elevation import _walk, elevation_gain

import numpy as np


def test_walk_golden():
    # dead band swallows the +-2 wiggle, counts the two real climbs
    ele = np.array([100.0, 102.0, 99.0, 110.0, 108.0, 95.0, 96.0, 120.0])
    asc, desc, ref = _walk(ele, 5.0)
    # 100->110 (+10), 110->95 (-15), 95->120 (+25)
    assert asc == 35.0 and desc == 15.0 and ref == 120.0


def test_walk_all_inside_band():
    ele = np.array([100.0, 101.0, 99.5, 100.5])
    assert _walk(ele, 5.0) == (0.0, 0.0, 100.0)


def test_elevation_gain_matches_python(spark):
    rows = []
    for u in range(6):
        for i in range(80):
            eid = u * 1000 + i
            rows.append((u, eid, 1500.0 + ((eid * 31) % 211) * 0.5 - ((eid * 13) % 157) * 0.3))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ele double")
    got = {r.user_id: r for r in elevation_gain(df, 5.0).collect()}
    for u in range(6):
        ele = np.array([r[2] for r in rows if r[0] == u])
        asc, desc, ref = _walk(ele, 5.0)
        g = got[u]
        assert g.n_points == 80
        assert g.ascent_m == asc and g.descent_m == desc and g.final_ref_m == ref
