"""Stay-point detection (operators/trajectory.py::stay_points) vs a
brute-force python reference of the Li et al. 2008 semantics (including
anchor creep), plus a direct DuckDB replay of the recursive oracle."""

import duckdb

from activity_files_spark.functions.geo import haversine_m_exact
from activity_files_spark.operators.trajectory import stay_points, stay_points_sql


def _brute(pts, d_max, t_min):
    """pts: list[(seq, id, tss, lat, lon)] sorted by seq ->
    [(start_seq, end_seq, start_id, end_id, n_points, dwell_s)]"""
    n = len(pts)
    out = []
    i = 0
    while i < n:
        jeff = n
        for j in range(i + 1, n):
            if haversine_m_exact(pts[i][3], pts[i][4], pts[j][3], pts[j][4]) > d_max:
                jeff = j
                break
        dur = pts[jeff - 1][2] - pts[i][2]
        if dur >= t_min:
            out.append((pts[i][0], pts[jeff - 1][0], pts[i][1],
                        pts[jeff - 1][1], jeff - i, dur))
            i = jeff
        else:
            i += 1
    return out


def _walk(uid, n, stations_every=12, step_s=30.0):
    pts = []
    for s in range(1, n + 1):
        station = (s - 1) // stations_every
        lat = 47.0 + station * 0.01 + ((s * 7) % 11) * 0.000045
        lon = 11.0 + station * 0.01 + ((s * 13) % 7) * 0.00005
        pts.append((uid, s, uid * 10000 + s, s * step_s, lat, lon))
    return pts


def test_stay_points_matches_brute(spark):
    rows = _walk(1, 40) + _walk(2, 29) + _walk(3, 7)
    df = spark.createDataFrame(
        rows, ["user_id", "seq", "event_id", "tss", "lat", "lon"]
    )
    got = sorted(
        tuple(r) for r in stay_points(df, 120.0, 240.0).collect()
    )
    want = []
    for uid in (1, 2, 3):
        pts = [(s, i, t, la, lo) for (u, s, i, t, la, lo) in rows if u == uid]
        for rec in _brute(pts, 120.0, 240.0):
            want.append((uid,) + rec)
    assert got == sorted(want)
    # full stations emit; the 7-point tail user (span 180s < 240s) does not
    assert any(r[0] == 1 for r in got) and any(r[0] == 2 for r in got)
    assert not any(r[0] == 3 for r in got)


def test_stay_points_anchor_creep(spark):
    # a drifting prefix where the radius breaks before the duration, then
    # a genuine dwell starting INSIDE the failed window: only the creep
    # (i -> i+1) variant finds it
    base = 47.0
    pts = []
    # 3 points drifting 90m apart (radius 100m breaks between 1 and 3)
    for s, dlat in ((1, 0.0), (2, 0.0008), (3, 0.0016)):
        pts.append((9, s, 900 + s, s * 50.0, base + dlat, 11.0))
    # dwell cluster near point 3
    for s in range(4, 10):
        pts.append((9, s, 900 + s, s * 50.0, base + 0.0016, 11.0))
    df = spark.createDataFrame(
        pts, ["user_id", "seq", "event_id", "tss", "lat", "lon"]
    )
    got = sorted(tuple(r) for r in stay_points(df, 100.0, 200.0).collect())
    ref = _brute([(s, i, t, la, lo) for (_, s, i, t, la, lo) in pts], 100.0, 200.0)
    assert got == sorted((9,) + r for r in ref)
    assert len(got) >= 1
    # the emitted stay must start after the drift, not at seq 1
    assert all(r[1] > 1 for r in got)


def test_stay_points_sql_twin(spark):
    rows = _walk(1, 40) + _walk(2, 29) + _walk(3, 7)
    df = spark.createDataFrame(
        rows, ["user_id", "seq", "event_id", "tss", "lat", "lon"]
    )
    got = sorted(tuple(r) for r in stay_points(df, 120.0, 240.0).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE walk(user_id BIGINT, seq BIGINT, event_id BIGINT,"
        " tss DOUBLE, lat DOUBLE, lon DOUBLE)"
    )
    con.executemany("INSERT INTO walk VALUES (?,?,?,?,?,?)", rows)
    body = stay_points_sql("walk", 120.0, 240.0)
    q = f"""WITH RECURSIVE {body}
    SELECT user_id, start_seq, end_seq, start_id, end_id, n_points, dwell_s
    FROM sp_out"""
    want = sorted(tuple(r) for r in con.execute(q).fetchall())
    assert got == want
