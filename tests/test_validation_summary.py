"""Validation diagnostics (validation.dart semantics) + session summary
(null-as-0 lap HR quirk) + split-by-sport + merge + gap-fill + sport
inference."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from activity_files_spark.operators.summary import (
    fill_time_gaps,
    infer_sport,
    merge_activities,
    session_summary,
    split_by_sport,
)
from activity_files_spark.operators.validation import (
    validate_all,
    validate_channels,
    validate_laps,
    validate_points,
)


def ts(s):
    return datetime.fromisoformat(s)


def mk_points(spark, rows):
    return spark.createDataFrame(
        rows, "activity_id string, seq long, ts timestamp, lat double, lon double, ele double"
    )


def test_validate_points_codes(spark):
    rows = [
        ("a", 0, ts("2024-03-01T10:00:00"), 40.0, -105.0, 1600.0),
        ("a", 1, ts("2024-03-01T09:59:00"), 40.0, -105.0, 1600.0),   # out of order
        ("a", 2, ts("2024-03-01T09:59:00"), 40.0, -105.0, 1600.0),   # dup ts
        ("a", 3, ts("2024-03-01T10:10:00"), 95.0, -105.0, 1600.0),   # bad lat + 11min gap
        ("a", 4, ts("2024-03-01T10:10:10"), 40.0, -105.0, 20000.0),  # bad ele
    ]
    codes = sorted(
        (r["code"], r["detail"]) for r in validate_points(mk_points(spark, rows)).collect()
    )
    names = [c for c, _ in codes]
    assert "validation.point_order" in names
    assert "validation.duplicate_timestamp" in names
    assert "validation.coordinate_range" in names
    assert "validation.elevation_range" in names
    assert "validation.time_gap" in names


def test_validate_channels_codes(spark):
    ch = spark.createDataFrame(
        [
            ("a", "heart_rate", ts("2024-03-01T10:00:00"), 300.0),   # out of range
            ("a", "heart_rate", ts("2024-03-01T10:00:10"), 140.0),
            ("a", "power", ts("2024-03-01T10:00:00"), -5.0),         # negative
            ("a", "distance", ts("2024-03-01T10:00:00"), 100.0),
            ("a", "distance", ts("2024-03-01T10:00:10"), 90.0),      # decreasing
            ("a", "cadence", ts("2024-03-01T10:00:00"), 82.0),       # single sample
        ],
        "activity_id string, channel string, ts timestamp, value double",
    )
    codes = [r["code"] for r in validate_channels(ch).collect()]
    for expect in (
        "validation.heart_rate_range",
        "validation.power_negative",
        "validation.distance_decreasing",
        "validation.channel_single_sample",
    ):
        assert expect in codes, codes
    # exactly one HR range warning (140 is fine)
    assert codes.count("validation.heart_rate_range") == 1


def test_validate_laps_codes(spark):
    pts = mk_points(spark, [
        ("a", 0, ts("2024-03-01T10:00:00"), 40.0, -105.0, 0.0),
        ("a", 1, ts("2024-03-01T10:10:00"), 40.0, -105.0, 0.0),
    ])
    laps = spark.createDataFrame(
        [
            ("a", 0, ts("2024-03-01T10:00:00"), ts("2024-03-01T10:05:00")),
            ("a", 1, ts("2024-03-01T10:04:00"), ts("2024-03-01T10:08:00")),  # overlap
            ("a", 2, ts("2024-03-01T10:09:00"), ts("2024-03-01T10:08:30")),  # inverted
            ("a", 3, ts("2024-03-01T11:00:00"), ts("2024-03-01T11:05:00")),  # outside
        ],
        "activity_id string, lap_id int, start_ts timestamp, end_ts timestamp",
    )
    codes = [r["code"] for r in validate_laps(laps, pts).collect()]
    assert "validation.lap_overlap" in codes
    assert "validation.lap_inverted" in codes
    assert "validation.lap_outside_envelope" in codes


def test_validate_all_clean_track_no_errors(spark):
    pts = mk_points(spark, [
        ("a", i, ts(f"2024-03-01T10:00:{i * 10:02d}"), 40.0 + i * 0.0005, -105.0, 1600.0)
        for i in range(3)
    ])
    out = validate_all(pts).collect()
    assert out == []


def test_session_summary_null_as_zero_quirk(spark):
    pts = mk_points(spark, [
        ("a", 0, ts("2024-03-01T10:00:00"), 40.0, -105.0, 0.0),
        ("a", 1, ts("2024-03-01T10:00:20"), 40.001, -105.001, 0.0),
    ])
    laps = spark.createDataFrame(
        [("a", 0, 150.0, 160.0), ("a", 1, None, 170.0), ("a", 2, 130.0, None)],
        "activity_id string, lap_id int, lap_avg_hr double, lap_max_hr double",
    )
    row = session_summary(pts, laps=laps).collect()[0]
    # null-as-0 mean: (150 + 0 + 130) / 3
    assert abs(row["lap_mean_avg_hr"] - (150 + 0 + 130) / 3) < 1e-9
    assert row["lap_max_hr"] == 170.0  # max ignores nulls
    assert row["num_laps"] == 3
    assert row["duration_s"] == 20.0 and row["n_points"] == 2


def test_split_by_sport(spark):
    pts = mk_points(spark, [
        ("a", i, ts(f"2024-03-01T10:{i:02d}:00"), 40.0, -105.0, 0.0) for i in range(30)
    ])
    laps = spark.createDataFrame(
        [
            ("a", 0, ts("2024-03-01T10:00:00"), ts("2024-03-01T10:09:00"), "swimming"),
            ("a", 1, ts("2024-03-01T10:10:00"), ts("2024-03-01T10:19:00"), "cycling"),
            ("a", 2, ts("2024-03-01T10:20:00"), ts("2024-03-01T10:29:00"), "running"),
        ],
        "activity_id string, lap_id int, start_ts timestamp, end_ts timestamp, sport string",
    )
    out = split_by_sport(pts, laps)
    by_sport = {r["sport"]: 0 for r in out.collect()}
    for r in out.collect():
        by_sport[r["sport"]] += 1
    assert by_sport == {"swimming": 10, "cycling": 10, "running": 10}


def test_merge_activities(spark):
    a = mk_points(spark, [("x", 0, ts("2024-03-01T10:00:00"), 40.0, -105.0, 0.0)])
    b = mk_points(spark, [("x", 1, ts("2024-03-01T09:59:00"), 40.1, -105.1, 0.0)])
    rows = merge_activities([a, b]).collect()
    assert [r["seq"] for r in rows] == [1, 0]  # re-sorted by ts


def test_fill_time_gaps(spark):
    pts = mk_points(spark, [
        ("a", 0, ts("2024-03-01T10:00:00"), 40.0, -105.0, 1600.0),
        ("a", 1, ts("2024-03-01T10:10:00"), 40.010, -105.0, 1660.0),  # 600s gap
        ("a", 2, ts("2024-03-01T10:10:30"), 40.011, -105.0, 1661.0),
    ])
    out = fill_time_gaps(pts, gap_s=300.0, step_s=60.0, max_inserted=10).orderBy("ts").collect()
    synth = [r for r in out if r["seq"] is None]
    assert len(synth) == 9  # floor(600/60)-1 interior points
    # lerp correctness at the midpoint (10:05:00 -> halfway)
    mid = [r for r in synth if str(r["ts"]) == "2024-03-01 10:05:00"][0]
    assert abs(mid["lat"] - 40.005) < 1e-9
    assert abs(mid["ele"] - 1630.0) < 1e-9
    assert len(out) == 12


def test_infer_sport(spark):
    # faithful to facade:1060-1093: token match (no substring), reference
    # keyword table — 'triathlon' is NOT a keyword (Sport enum has no
    # multisport; merge handles triathlons via per-lap sports)
    df = spark.createDataFrame(
        [("Morning Run",), ("Lunch RIDE",), ("ocean swim",), ("Triathlon race",), ("unknown",)],
        "name string",
    )
    got = [r["s"] for r in df.select(infer_sport(F.col("name")).alias("s")).collect()]
    assert got == ["running", "cycling", "swimming", None, None]


def test_manufacturer_table_full_reference_parity(spark):
    """validation §2.11: the manufacturer table carries the reference's full
    public FIT-SDK id set (models.dart:40-220) — no device_id_unknown for
    any reference-known id."""
    from activity_files_spark.operators.validation import (
        MANUFACTURER_IDS,
        validate_devices,
    )
    from pyspark.sql import functions as F

    assert len(MANUFACTURER_IDS) >= 179
    # spot-check ids across the table incl. the sparse tail
    assert MANUFACTURER_IDS[1] == "Garmin"
    assert MANUFACTURER_IDS[294] == "Coros"
    assert MANUFACTURER_IDS[260] == "Zwift"
    assert MANUFACTURER_IDS[5759] == "Actigraphcorp"
    rows = [(f"a{mid}", {"device.manufacturer": str(mid)})
            for mid in MANUFACTURER_IDS]
    meta = spark.createDataFrame(rows, "activity_id string, attrs map<string,string>")
    diags = validate_devices(meta)
    unknown = diags.filter(F.col("code") == "validation.device_id_unknown").count()
    assert unknown == 0
    # a genuinely unknown id still flags
    meta2 = spark.createDataFrame(
        [("ax", {"device.manufacturer": "777"})],
        "activity_id string, attrs map<string,string>")
    assert validate_devices(meta2).filter(
        F.col("code") == "validation.device_id_unknown").count() == 1
