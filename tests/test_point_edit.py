"""Point-level editing API parity — the reference's RawEditor.insertPoint /
deletePointAt / updatePoint / shiftTime plus the pause-edit interval frames
(raw_editor.dart:244-365, 407-503), ported from
test/unit/raw_editor_edit_test.dart (54 cases) and
test/integration/point_edit_integration_test.dart.

The repo's list-position convention: ``seq`` is the contiguous 0-based list
index per activity; edits renumber it exactly like Dart's ``List``.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from activity_files_spark.operators.normalize import (
    delete_point_at,
    insert_pause,
    insert_pause_intervals,
    insert_point,
    remove_pause,
    remove_pause_intervals,
    shift_time,
    update_point,
)


def ts(s):
    return datetime.fromisoformat(s)


BASE = "2024-02-01T06:00:"


def _points(spark, rows):
    """rows: list of (seq, lat, lon, iso_ts)."""
    return spark.createDataFrame(
        [("a", int(q), float(la), float(lo), ts(t)) for q, la, lo, t in rows],
        "activity_id string, seq long, lat double, lon double, ts timestamp",
    )


def _by_seq(df):
    return {
        r["seq"]: (r["lat"], r["lon"], str(r["ts"]))
        for r in df.collect()
    }


# ---------------------------------------------------------------------------
# insertPoint (raw_editor_edit_test.dart:77-175)
# ---------------------------------------------------------------------------


def test_insert_point_appends_after_all(spark):
    df = _points(spark, [(0, 40.0, -105.0, BASE + "00"),
                         (1, 40.001, -105.001, BASE + "10")])
    out = _by_seq(insert_point(df, {"ts": BASE + "20", "lat": 40.002, "lon": -105.002}))
    assert len(out) == 3
    assert out[2][0] == 40.002  # appended at the end


def test_insert_point_before_first_later(spark):
    df = _points(spark, [(0, 40.0, -105.0, BASE + "00"),
                         (1, 40.002, -105.002, BASE + "20")])
    out = _by_seq(insert_point(df, {"ts": BASE + "10", "lat": 40.001, "lon": -105.001}))
    assert len(out) == 3
    assert out[1][0] == 40.001
    assert out[2][0] == 40.002  # old index 1 shifted up


def test_insert_point_at_front(spark):
    df = _points(spark, [(0, 40.001, -105.001, BASE + "10")])
    out = _by_seq(insert_point(df, {"ts": BASE + "00", "lat": 40.0, "lon": -105.0}))
    assert out[0][0] == 40.0
    assert out[1][0] == 40.001


def test_insert_point_tie_goes_after_equal_ts(spark):
    """First index whose ts is STRICTLY after the new ts — an equal-ts
    existing point stays before the inserted one (indexWhere isAfter)."""
    df = _points(spark, [(0, 40.0, -105.0, BASE + "10"),
                         (1, 40.001, -105.001, BASE + "20")])
    out = _by_seq(insert_point(df, {"ts": BASE + "10", "lat": 40.9, "lon": -105.9}))
    assert out[0][0] == 40.0
    assert out[1][0] == 40.9


def test_insert_point_unsorted_list_uses_first_later_position(spark):
    """The reference does NOT re-sort: in an unsorted list the new point
    lands at the FIRST position whose ts is later, even if a later position
    holds an earlier ts."""
    df = _points(spark, [(0, 40.0, -105.0, BASE + "30"),
                         (1, 40.001, -105.001, BASE + "10")])
    out = _by_seq(insert_point(df, {"ts": BASE + "20", "lat": 40.9, "lon": -105.9}))
    assert out[0][0] == 40.9   # inserted before the first later-ts position
    assert out[1][0] == 40.0
    assert out[2][0] == 40.001


def test_insert_point_requires_ts(spark):
    df = _points(spark, [(0, 40.0, -105.0, BASE + "00")])
    with pytest.raises(ValueError):
        insert_point(df, {"lat": 1.0})


def test_insert_point_multi_activity_independent(spark):
    df = spark.createDataFrame(
        [("a", 0, 40.0, -105.0, ts(BASE + "00")),
         ("b", 0, 50.0, -100.0, ts(BASE + "20"))],
        "activity_id string, seq long, lat double, lon double, ts timestamp",
    )
    out = insert_point(df, {"ts": BASE + "10", "lat": 41.0, "lon": -106.0})
    rows = {(r["activity_id"], r["seq"]): r["lat"] for r in out.collect()}
    assert rows[("a", 1)] == 41.0   # appended after a's only point
    assert rows[("b", 0)] == 41.0   # inserted before b's later point
    assert rows[("b", 1)] == 50.0


# ---------------------------------------------------------------------------
# deletePointAt (raw_editor_edit_test.dart:181-276)
# ---------------------------------------------------------------------------


def _three(spark):
    return _points(spark, [(0, 40.0, -105.0, BASE + "00"),
                           (1, 40.001, -105.001, BASE + "10"),
                           (2, 40.002, -105.002, BASE + "20")])


def test_delete_point_at_middle(spark):
    out = _by_seq(delete_point_at(_three(spark), 1))
    assert len(out) == 2
    assert out[0][0] == 40.0
    assert out[1][0] == 40.002  # closed up


def test_delete_point_at_first_and_last(spark):
    assert _by_seq(delete_point_at(_three(spark), 0))[0][0] == 40.001
    assert 2 not in _by_seq(delete_point_at(_three(spark), 2))


def test_delete_point_at_negative_raises(spark):
    with pytest.raises(IndexError):
        delete_point_at(_three(spark), -1)


def test_delete_point_at_length_raises(spark):
    with pytest.raises(IndexError):
        delete_point_at(_three(spark), 3)


def test_delete_point_at_strict_false_is_lazy_noop_when_out_of_range(spark):
    out = delete_point_at(_three(spark), 7, strict=False)
    assert out.count() == 3


# ---------------------------------------------------------------------------
# updatePoint (raw_editor_edit_test.dart:282-421)
# ---------------------------------------------------------------------------


def test_update_point_lat_lon_in_place(spark):
    out = _by_seq(update_point(_three(spark), 0, lat=41.0, lon=-106.0))
    assert out[0] == (41.0, -106.0, "2024-02-01 06:00:00")
    assert out[1][0] == 40.001  # untouched


def test_update_point_preserves_unspecified_fields(spark):
    out = _by_seq(update_point(_three(spark), 1, lat=41.5))
    assert out[1] == (41.5, -105.001, "2024-02-01 06:00:10")


def test_update_point_time_resorts(spark):
    # move the last point (seq 2) between 0 and 1
    out = _by_seq(update_point(_three(spark), 2, ts=BASE + "05"))
    assert out[1][0] == 40.002
    assert out[2][0] == 40.001
    assert out[1][2] == "2024-02-01 06:00:05"


def test_update_point_no_time_no_resort(spark):
    # unsorted input stays unsorted when ts isn't updated
    df = _points(spark, [(0, 40.0, -105.0, BASE + "30"),
                         (1, 40.001, -105.001, BASE + "10")])
    out = _by_seq(update_point(df, 0, lat=41.0))
    assert out[0][0] == 41.0
    assert out[0][2] == "2024-02-01 06:00:30"


def test_update_point_out_of_range_raises(spark):
    with pytest.raises(IndexError):
        update_point(_three(spark), 5, lat=41.0)
    with pytest.raises(IndexError):
        update_point(_three(spark), -1, lat=41.0)


def test_update_point_time_tie_is_stable(spark):
    # new ts equal to an existing point's ts: prior relative order kept
    out = _by_seq(update_point(_three(spark), 2, ts=BASE + "10"))
    assert out[1][0] == 40.001  # original seq-1 point first
    assert out[2][0] == 40.002


# ---------------------------------------------------------------------------
# shiftTime (raw_editor.dart:244-291 + the sets-fix group)
# ---------------------------------------------------------------------------


def test_shift_time_points_forward_and_back(spark):
    df = _three(spark)
    fwd = _by_seq(shift_time(df, 3600.0))
    assert fwd[0][2] == "2024-02-01 07:00:00"
    back = _by_seq(shift_time(df, -7200.0))
    assert back[2][2] == "2024-02-01 04:00:20"


def test_shift_time_subsecond(spark):
    out = _by_seq(shift_time(_three(spark), 0.25))
    assert out[0][2] == "2024-02-01 06:00:00.250000"


def test_shift_time_interval_frames(spark):
    laps = spark.createDataFrame(
        [("a", ts(BASE + "00"), ts(BASE + "30"))],
        "activity_id string, start_ts timestamp, end_ts timestamp",
    )
    row = shift_time(laps, 60.0, ts_cols=("start_ts", "end_ts")).first()
    assert str(row["start_ts"]) == "2024-02-01 06:01:00"
    assert str(row["end_ts"]) == "2024-02-01 06:01:30"


# ---------------------------------------------------------------------------
# insertPause on interval frames (raw_editor_edit_test.dart:697-855)
# ---------------------------------------------------------------------------


def _lap(spark, start_iso, end_iso):
    return spark.createDataFrame(
        [("a", ts(start_iso), ts(end_iso))],
        "activity_id string, start_ts timestamp, end_ts timestamp",
    )


def test_insert_pause_lap_fully_after_shifts_both(spark):
    out = insert_pause_intervals(
        _lap(spark, BASE + "15", BASE + "25"), BASE + "10", 120.0
    ).first()
    assert str(out["start_ts"]) == "2024-02-01 06:02:15"
    assert str(out["end_ts"]) == "2024-02-01 06:02:25"


def test_insert_pause_lap_straddling_extends_end_only(spark):
    out = insert_pause_intervals(
        _lap(spark, BASE + "05", BASE + "25"), BASE + "15", 180.0
    ).first()
    assert str(out["start_ts"]) == "2024-02-01 06:00:05"
    assert str(out["end_ts"]) == "2024-02-01 06:03:25"


def test_insert_pause_lap_fully_before_unchanged(spark):
    out = insert_pause_intervals(
        _lap(spark, BASE + "00", BASE + "20"), BASE + "30", 60.0
    ).first()
    assert str(out["end_ts"]) == "2024-02-01 06:00:20"


def test_insert_pause_negative_duration_raises(spark):
    with pytest.raises(ValueError):
        insert_pause_intervals(_lap(spark, BASE + "00", BASE + "10"), BASE + "00", -1.0)
    with pytest.raises(ValueError):
        insert_pause(_lap(spark, BASE + "00", BASE + "10"), BASE + "00", -1.0, ts="start_ts")


# ---------------------------------------------------------------------------
# removePause on interval frames (raw_editor_edit_test.dart:861-1059)
# ---------------------------------------------------------------------------


def test_remove_pause_lap_spanning_gap_shifts_end_back(spark):
    out = remove_pause_intervals(
        _lap(spark, BASE + "00", BASE + "50"), BASE + "10", BASE + "30"
    ).first()
    assert str(out["start_ts"]) == "2024-02-01 06:00:00"
    assert str(out["end_ts"]) == "2024-02-01 06:00:30"  # 50 - 20s gap


def test_remove_pause_lap_collapsed_by_clip_is_dropped(spark):
    # starts at `from`, ends inside the gap -> clipped to [from, from] -> dropped
    out = remove_pause_intervals(
        _lap(spark, BASE + "10", BASE + "20"), BASE + "10", BASE + "30"
    )
    assert out.count() == 0


def test_remove_pause_lap_fully_after_shifts_both(spark):
    out = remove_pause_intervals(
        _lap(spark, BASE + "35", BASE + "45"), BASE + "10", BASE + "30"
    ).first()
    assert str(out["start_ts"]) == "2024-02-01 06:00:15"
    assert str(out["end_ts"]) == "2024-02-01 06:00:25"


def test_remove_pause_lap_straddle_end_snaps_start(spark):
    out = remove_pause_intervals(
        _lap(spark, BASE + "20", BASE + "40"), BASE + "10", BASE + "30"
    ).first()
    assert str(out["start_ts"]) == "2024-02-01 06:00:10"  # snapped to `from`
    assert str(out["end_ts"]) == "2024-02-01 06:00:20"    # 40 - gap


def test_remove_pause_lap_straddle_start_clips_end(spark):
    out = remove_pause_intervals(
        _lap(spark, BASE + "00", BASE + "15"), BASE + "10", BASE + "30"
    ).first()
    assert str(out["start_ts"]) == "2024-02-01 06:00:00"
    assert str(out["end_ts"]) == "2024-02-01 06:00:10"    # clipped to `from`


def test_remove_pause_lap_fully_inside_removed(spark):
    out = remove_pause_intervals(
        _lap(spark, BASE + "12", BASE + "18"), BASE + "10", BASE + "30"
    )
    assert out.count() == 0


def test_remove_pause_zero_gap_noop(spark):
    out = remove_pause_intervals(
        _lap(spark, BASE + "00", BASE + "20"), BASE + "10", BASE + "10"
    ).first()
    assert str(out["end_ts"]) == "2024-02-01 06:00:20"


def test_remove_pause_backwards_raises(spark):
    with pytest.raises(ValueError):
        remove_pause_intervals(_lap(spark, BASE + "00", BASE + "10"), BASE + "20", BASE + "00")


# ---------------------------------------------------------------------------
# Integration: the composed chain mirrors point_edit_integration_test.dart
# ---------------------------------------------------------------------------


def test_point_edit_chain_integration(spark):
    df = _points(spark, [(0, 40.0, -105.0, BASE + "00"),
                         (1, 40.001, -105.001, BASE + "10"),
                         (2, 40.002, -105.002, BASE + "20"),
                         (3, 40.003, -105.003, BASE + "30")])
    x = shift_time(df, 60.0)
    x = insert_point(x, {"ts": "2024-02-01T06:01:15", "lat": 40.9, "lon": -105.9})
    x = update_point(x, 0, lat=39.5)
    x = delete_point_at(x, 4)
    out = _by_seq(x)
    assert len(out) == 4
    assert out[0] == (39.5, -105.0, "2024-02-01 06:01:00")
    assert out[1][0] == 40.001
    assert out[2][0] == 40.9       # inserted between :10 and :20 (shifted)
    assert out[3][0] == 40.002     # old last point (40.003) deleted at index 4


def test_insert_point_into_empty_activity_via_keys(spark):
    """RawEditor.insertPoint on an empty points list appends — the
    DataFrame twin takes the activity universe via ``keys`` so zero-row
    activities get the new point at position 0."""
    df = _points(spark, [(0, 40.0, -105.0, BASE + "00")])
    keys = spark.createDataFrame([("a",), ("b",)], "activity_id string")
    out = insert_point(
        df, {"ts": BASE + "10", "lat": 41.0, "lon": -106.0}, keys=keys
    )
    rows = {(r["activity_id"], r["seq"]): r["lat"] for r in out.collect()}
    assert rows[("a", 1)] == 41.0  # appended after a's existing point
    assert rows[("b", 0)] == 41.0  # empty activity: inserted at position 0
    assert len(rows) == 3
