"""Normalization + window operator semantics, pinned to the reference:
last-wins dedup (raw_editor.dart:21-67), trimInvalid rules (:82-195),
edge-clamped smoothing (:616-643), contiguous-group filter
(fit_parser.dart:1252-1332), distance-split laps (raw_editor.dart:683-750).
"""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from activity_files_spark.functions.geo import haversine_m_py
from activity_files_spark.operators.normalize import (
    crop,
    delete_range,
    largest_contiguous_group,
    sort_dedup,
    trim_channels_to_envelope,
    trim_invalid,
)
from activity_files_spark.operators.windows import (
    cumulative_distance,
    detect_gaps,
    mark_laps_by_distance,
    recompute_speed,
    sessionize_gap,
    smooth,
)


def ts(s):
    return datetime.fromisoformat(s).replace(tzinfo=None)


def mk_points(spark, rows):
    return spark.createDataFrame(
        rows, "activity_id string, seq long, ts timestamp, lat double, lon double, ele double"
    )


def test_sort_dedup_last_wins(spark):
    rows = [
        ("a", 0, ts("2024-03-01T10:00:00"), 40.0, -105.0, 1600.0),
        ("a", 1, ts("2024-03-01T10:00:10"), 40.0005, -105.0005, 1601.0),
        ("a", 2, ts("2024-03-01T10:00:10"), 41.0, -106.0, 9999.0),  # dup ts: wins
        ("a", 3, ts("2024-03-01T10:00:05"), 40.0002, -105.0002, 1600.5),  # out of order
    ]
    out = sort_dedup(mk_points(spark, rows)).orderBy("ts").collect()
    assert [r["seq"] for r in out] == [0, 3, 2]
    assert out[2]["lat"] == 41.0  # last occurrence won


def test_trim_invalid_rules(spark):
    rows = [
        ("a", 0, ts("2024-03-01T10:00:00"), 40.0, -105.0, 1600.0),     # keep
        ("a", 1, ts("2024-03-01T10:00:10"), 91.0, -105.0, 1600.0),     # lat out of range
        ("a", 2, ts("2024-03-01T10:00:20"), 40.0, 181.0, 1600.0),      # lon out of range
        ("a", 3, ts("2024-03-01T10:00:30"), 1e-9, 1e-9, 1600.0),       # Null Island
        ("a", 4, ts("2024-03-01T10:00:40"), 40.0, -105.0, -500.0),     # ele cleared
        ("a", 5, ts("2024-03-01T10:00:50"), float("nan"), -105.0, 0.0),  # NaN dropped
    ]
    out = {r["seq"]: r for r in trim_invalid(mk_points(spark, rows)).collect()}
    assert sorted(out) == [0, 4]
    assert out[4]["ele"] is None  # cleared, not dropped
    assert out[0]["ele"] == 1600.0


def test_trim_channels_to_envelope(spark):
    pts = mk_points(
        spark,
        [
            ("a", 0, ts("2024-03-01T10:00:00"), 40.0, -105.0, 0.0),
            ("a", 1, ts("2024-03-01T10:00:20"), 40.0, -105.0, 0.0),
        ],
    )
    ch = spark.createDataFrame(
        [
            ("a", "heart_rate", ts("2024-03-01T09:59:59"), 100.0),  # before -> drop
            ("a", "heart_rate", ts("2024-03-01T10:00:00"), 140.0),  # boundary -> keep
            ("a", "heart_rate", ts("2024-03-01T10:00:21"), 150.0),  # after -> drop
        ],
        "activity_id string, channel string, ts timestamp, value double",
    )
    out = trim_channels_to_envelope(ch, pts).collect()
    assert len(out) == 1 and out[0]["value"] == 140.0


def test_crop_and_delete_range(spark):
    rows = [("a", i, ts(f"2024-03-01T10:00:{i:02d}"), 40.0, -105.0, 0.0) for i in range(0, 50, 10)]
    df = mk_points(spark, rows)
    c = crop(df, "2024-03-01T10:00:10", "2024-03-01T10:00:30")
    assert sorted(r["seq"] for r in c.collect()) == [10, 20, 30]  # inclusive both ends
    d = delete_range(df, "2024-03-01T10:00:10", "2024-03-01T10:00:30")
    assert sorted(r["seq"] for r in d.collect()) == [0, 40]


def test_smooth_edge_clamped(spark):
    # window=3 -> left=1, right=1; edges clamp (reference prefix-sum behavior)
    ch = spark.createDataFrame(
        [("a", ts(f"2024-03-01T10:00:{i:02d}"), float(v)) for i, v in enumerate([140, 142, 145, 143, 141])],
        "activity_id string, ts timestamp, value double",
    )
    out = [r["value"] for r in smooth(ch, window=3).orderBy("ts").collect()]
    assert out[0] == (140 + 142) / 2  # left edge: only 2 values
    assert out[1] == (140 + 142 + 145) / 3
    assert out[-1] == (143 + 141) / 2  # right edge


def test_recompute_speed_and_cumdist(spark):
    rows = [
        ("a", 0, ts("2024-03-01T10:00:00"), 40.0, -105.0, 0.0),
        ("a", 1, ts("2024-03-01T10:00:10"), 40.0005, -105.0005, 0.0),
        ("a", 2, ts("2024-03-01T10:00:20"), 40.001, -105.001, 0.0),
    ]
    df = mk_points(spark, rows)
    out = cumulative_distance(df).orderBy("ts").collect()
    d01 = haversine_m_py(40.0, -105.0, 40.0005, -105.0005)
    d12 = haversine_m_py(40.0005, -105.0005, 40.001, -105.001)
    assert abs(out[0]["distance_m"]) < 1e-9
    assert abs(out[1]["distance_m"] - d01) < 1e-6
    assert abs(out[2]["distance_m"] - (d01 + d12)) < 1e-6
    sp = recompute_speed(df).orderBy("ts").collect()
    assert sp[0]["speed_mps"] == 0.0
    assert abs(sp[1]["speed_mps"] - d01 / 10.0) < 1e-9


def test_detect_gaps(spark):
    rows = [
        ("a", 0, ts("2024-03-01T10:00:00"), 40.0, -105.0, 0.0),
        ("a", 1, ts("2024-03-01T10:00:10"), 40.0, -105.0, 0.0),
        ("a", 2, ts("2024-03-01T10:10:11"), 40.0, -105.0, 0.0),  # 601s gap
    ]
    out = detect_gaps(mk_points(spark, rows), threshold_s=300.0).collect()
    assert len(out) == 1 and out[0]["seq"] == 2


def test_largest_contiguous_group(spark):
    rows = (
        [("a", i, ts(f"2024-03-01T10:00:{i:02d}"), 40.0, -105.0, 0.0) for i in range(3)]
        # 25h gap -> new group with 5 points (larger, wins)
        + [("a", 10 + i, ts(f"2024-03-02T11:00:{i:02d}"), 50.0, -100.0, 0.0) for i in range(5)]
    )
    out = largest_contiguous_group(mk_points(spark, rows), max_gap_hours=24.0).collect()
    assert sorted(r["seq"] for r in out) == [10, 11, 12, 13, 14]


def test_mark_laps_by_distance(spark):
    # points every ~55.66m going north; split at 150m
    rows = [
        ("a", i, ts(f"2024-03-01T10:{i // 60:02d}:{i % 60:02d}"), 40.0 + i * 0.0005, -105.0, 0.0)
        for i in range(10)
    ]
    laps = mark_laps_by_distance(mk_points(spark, rows), split_m=150.0).orderBy("lap_id").collect()
    assert len(laps) == 3
    assert sum(lp["n_points"] for lp in laps) == 10
    # boundary point CLOSES its lap (reference emits lap at boundary sample):
    # cum-before-step: 0,0,55.7,111.3 -> lap 0 (4 pts, incl. the crossing pt)
    assert laps[0]["n_points"] == 4
    # full laps cover exactly the split distance
    assert laps[0]["distance_m"] == 150.0
    assert laps[1]["distance_m"] == 150.0


def test_sessionize_gap(spark):
    rows = [
        (1, ts("2024-01-01T00:00:00")),
        (1, ts("2024-01-01T00:10:00")),
        (1, ts("2024-01-01T02:00:00")),  # > 1h gap -> new session
        (2, ts("2024-01-01T00:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize_gap(df, gap_s=3600.0).collect()
    sess = {(r["user_id"], str(r["ts"])): r["session_id"] for r in out}
    assert sess[(1, "2024-01-01 00:00:00")] == 0
    assert sess[(1, "2024-01-01 00:10:00")] == 0
    assert sess[(1, "2024-01-01 02:00:00")] == 1
    assert sess[(2, "2024-01-01 00:00:00")] == 0


def test_filter_speed_spikes(spark):
    """Isolated teleport dropped; fast-but-sustained movement kept (high
    speed only on one side per point); endpoints kept; Δt<=0 is never
    spike evidence."""
    from datetime import datetime

    from activity_files_spark.operators.normalize import filter_speed_spikes

    t = lambda s: datetime(2024, 3, 1, 10, 0, s)
    rows = [
        # walking pace ~1.1 m/s per 10 s step along lat
        ("a", 0, t(0), 40.0000, -105.0),
        ("a", 1, t(10), 40.0001, -105.0),
        ("a", 2, t(20), 40.5000, -105.0),   # teleport out+back -> spike
        ("a", 3, t(30), 40.0003, -105.0),
        ("a", 4, t(40), 40.0004, -105.0),
        # user b: genuine sprint away (fast on ONE side only each point)
        ("b", 0, t(0), 40.0000, -105.0),
        ("b", 1, t(10), 40.0001, -105.0),
        ("b", 2, t(20), 40.1000, -105.0),   # fast in, fast out? next hop fast too
        ("b", 3, t(30), 40.2000, -105.0),   # sustained fast: both sides fast...
        # user c: duplicate timestamp -> dt=0 -> no evidence, kept
        ("c", 0, t(0), 40.0, -105.0),
        ("c", 1, t(0), 44.0, -105.0),
        ("c", 2, t(10), 40.0001, -105.0),
    ]
    df = spark.createDataFrame(rows, "user_id string, seq int, ts timestamp, lat double, lon double")
    kept = filter_speed_spikes(df, 50.0, key="user_id", ts="ts", tiebreak="seq")
    got = sorted((r["user_id"], r["seq"]) for r in kept.collect())
    # a2 dropped (~1100 m/s both sides). b2 is an interior sustained-fast
    # point with both sides above vmax=50 -> dropped (the documented
    # one-pass limitation); b3 is the LAST point (one neighbor) -> kept.
    # c1: dt=0 on the prev side -> NULL evidence -> kept despite the jump.
    assert got == [
        ("a", 0), ("a", 1), ("a", 3), ("a", 4),
        ("b", 0), ("b", 1), ("b", 3),
        ("c", 0), ("c", 1), ("c", 2),
    ]
    # with a generous vmax nothing is dropped
    assert filter_speed_spikes(df, 1e9, key="user_id", ts="ts", tiebreak="seq").count() == len(rows)


def test_dwell_sessions(spark):
    """Contiguous inside-runs split correctly: re-entry starts a new run,
    boundary points are inclusive, single-point runs have dwell 0."""
    from datetime import datetime

    from activity_files_spark.operators.windows import dwell_sessions

    t = lambda s: datetime(2024, 3, 1, 10, 0, s)
    # rect: lon [-105.2, -105.0], lat [40.0, 40.2]
    rows = [
        ("a", 0, t(0), 40.10, -105.10),   # in  (run 1)
        ("a", 1, t(10), 40.15, -105.05),  # in  (run 1)
        ("a", 2, t(20), 40.30, -105.05),  # out
        ("a", 3, t(30), 40.20, -105.20),  # in, exact corner (run 2)
        ("a", 4, t(40), 40.19, -105.19),  # in  (run 2)
        ("a", 5, t(50), 40.50, -105.50),  # out
        ("a", 6, t(55), 40.00, -105.00),  # in, single point (run 3)
        ("b", 0, t(0), 41.00, -104.00),   # never inside
    ]
    df = spark.createDataFrame(
        rows, "user_id string, seq int, ts timestamp, lat double, lon double"
    )
    out = dwell_sessions(df, -105.2, -105.0, 40.0, 40.2,
                         key="user_id", ts="ts", tiebreak="seq")
    got = sorted(
        (r["user_id"], str(r["enter_ts"]), str(r["exit_ts"]), r["n_points"], r["dwell_s"])
        for r in out.collect()
    )
    assert got == [
        ("a", "2024-03-01 10:00:00", "2024-03-01 10:00:10", 2, 10.0),
        ("a", "2024-03-01 10:00:30", "2024-03-01 10:00:40", 2, 10.0),
        ("a", "2024-03-01 10:00:55", "2024-03-01 10:00:55", 1, 0.0),
    ]


def test_exact_percentiles(spark):
    """Order-statistic definition vs a direct sorted-list reference, incl.
    duplicates and tiny groups."""
    import math as _math
    import random as _random

    import duckdb
    import pandas as pd

    from activity_files_spark.operators.windows import (
        exact_percentiles,
        exact_percentiles_sql,
    )

    rng = _random.Random(59)
    rows = []
    for k in range(12):
        n = rng.choice([1, 2, 3, 7, 50, 200])
        for _ in range(n):
            rows.append((k, float(rng.choice([1, 2, 2, 3, 5, 8, 13, 21]))))
    sdf = spark.createDataFrame(rows, "k long, v double")
    got = {r["k"]: r for r in exact_percentiles(sdf, "k", "v").collect()}
    by_k = {}
    for k, v in rows:
        by_k.setdefault(k, []).append(v)
    for k, vs in by_k.items():
        vs = sorted(vs)
        n = len(vs)
        assert got[k]["n"] == n
        for q, name in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            assert got[k][name] == vs[_math.ceil(q * n) - 1], (k, name)
    # SQL twin parity
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    ctes, final = exact_percentiles_sql("src", "k", "v")
    exp = duckdb.sql(
        f"WITH src AS (SELECT * FROM pdf),\n    {ctes}\n"
        f"SELECT k, n, p50, p90, p99 FROM {final} ORDER BY k"
    ).fetchall()
    for k, n, p50, p90, p99 in exp:
        assert (got[k]["n"], got[k]["p50"], got[k]["p90"], got[k]["p99"]) == (
            n,
            p50,
            p90,
            p99,
        )
