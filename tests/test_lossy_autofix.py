"""Lossy-conversion accounting (facade.dart:299-382) and the auto-fix
pipeline (facade.dart:2167-2288, pipeline_options.dart:40-104)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from activity_files_spark.operators.validation import lossy_diagnostics
from activity_files_spark.plans.autofix import (
    AutoFixOptions,
    auto_fix,
    auto_lap_distance_for_sport,
)
from activity_files_spark.sources.records import RECORD_SCHEMA, records_frame


def _records_df(spark, rows):
    return spark.createDataFrame(records_frame(rows), RECORD_SCHEMA)


T0 = pd.Timestamp("2024-01-10 07:00:00")


def _rich_activity(aid="a1"):
    """Activity carrying every droppable feature: 2 tracks, 2 sessions,
    summary stats, sets, lengths, timer events, laps."""
    rows = [
        {"activity_id": aid, "kind": "point", "seq": i,
         "ts": T0 + pd.Timedelta(seconds=10 * i),
         "lat": 40.0 + i * 1e-4, "lon": -105.0}
        for i in range(4)
    ]
    rows += [
        {"activity_id": aid, "kind": "lap", "lap_id": 0, "start_ts": T0,
         "end_ts": T0 + pd.Timedelta(seconds=30)},
        {"activity_id": aid, "kind": "set", "start_ts": T0,
         "end_ts": T0 + pd.Timedelta(seconds=45),
         "attrs": {"repetitions": "10"}},
        {"activity_id": aid, "kind": "length", "start_ts": T0,
         "end_ts": T0 + pd.Timedelta(seconds=30),
         "attrs": {"total_strokes": "12"}},
        {"activity_id": aid, "kind": "channel", "channel": "event",
         "ts": T0, "value": 0.0},
        {"activity_id": aid, "kind": "meta",
         "attrs": {"format": "fit", "session.count": "2", "track.count": "2",
                   "session.total_distance_m": "1000.0"}},
    ]
    return rows


class TestLossyDiagnostics:
    # expected lossy codes per conversion target for the rich activity —
    # the reference's format grid (facade.dart:317-382)
    GRID = {
        "fit": {"lossy.multi_track_flattened"},
        "gpx": {"lossy.sets_dropped", "lossy.events_dropped",
                "lossy.lengths_dropped", "lossy.sessions_dropped",
                "lossy.summary_dropped", "lossy.laps_dropped"},
        "tcx": {"lossy.multi_track_flattened", "lossy.sets_dropped",
                "lossy.events_dropped", "lossy.lengths_dropped",
                "lossy.sessions_dropped", "lossy.summary_dropped"},
        "csv": {"lossy.multi_track_flattened", "lossy.sets_dropped",
                "lossy.events_dropped", "lossy.lengths_dropped",
                "lossy.sessions_dropped", "lossy.summary_dropped",
                "lossy.laps_dropped"},
        "geojson": {"lossy.multi_track_flattened", "lossy.sets_dropped",
                    "lossy.events_dropped", "lossy.lengths_dropped",
                    "lossy.sessions_dropped", "lossy.summary_dropped"},
    }

    @pytest.mark.parametrize("to_fmt", sorted(GRID))
    def test_format_grid(self, spark, to_fmt):
        records = _records_df(spark, _rich_activity())
        out = lossy_diagnostics(records, to_fmt).collect()
        codes = {r["code"] for r in out}
        assert codes == self.GRID[to_fmt], to_fmt
        assert all(r["severity"] == "info" for r in out)

    def test_clean_activity_emits_nothing(self, spark):
        rows = [
            {"activity_id": "c", "kind": "point", "seq": 0, "ts": T0,
             "lat": 40.0, "lon": -105.0},
            {"activity_id": "c", "kind": "meta",
             "attrs": {"format": "gpx", "track.count": "1"}},
        ]
        records = _records_df(spark, rows)
        for fmt in ("fit", "gpx", "tcx", "csv", "geojson"):
            assert lossy_diagnostics(records, fmt).count() == 0

    def test_counts_in_messages(self, spark):
        records = _records_df(spark, _rich_activity())
        out = {r["code"]: r["detail"] for r in
               lossy_diagnostics(records, "csv").collect()}
        assert out["lossy.multi_track_flattened"].startswith(
            "Source contains 1 additional track(s)")
        assert out["lossy.sessions_dropped"].startswith("1 additional session(s)")
        assert out["lossy.laps_dropped"].startswith("1 lap(s)")
        assert "Export to FIT" in \
            {r["code"]: r["fix"] for r in
             lossy_diagnostics(records, "csv").collect()}["lossy.sets_dropped"]


class TestAutoLapDistanceForSport:
    @pytest.mark.parametrize("sport,expected", [
        ("running", 1000.0), ("walking", 1000.0), ("hiking", 1000.0),
        ("cycling", 5000.0), ("swimming", 1000.0), (None, 1000.0),
    ])
    def test_sport_splits(self, spark, sport, expected):
        df = spark.createDataFrame([(sport,)], "sport string").select(
            auto_lap_distance_for_sport(F.col("sport"), AutoFixOptions())
            .alias("split")
        )
        assert df.first()["split"] == expected

    def test_global_override_wins(self, spark):
        opts = AutoFixOptions(auto_lap_distance_m=400.0)
        df = spark.createDataFrame([("cycling",)], "sport string").select(
            auto_lap_distance_for_sport(F.col("sport"), opts).alias("split")
        )
        assert df.first()["split"] == 400.0


def _multisport_points(spark):
    """Two activities: a 'run' with ~2.5 km of 100 m steps (and two invalid
    points), a 'ride' with ~7 km of 500 m steps. 100 m of latitude is
    ~0.0008993 deg."""
    deg_100m = 100.0 / 111194.92664455873

    def t(sec):
        return (T0 + pd.Timedelta(seconds=sec)).to_pydatetime()

    rows = []
    for i in range(26):  # 25 * 100 m = 2.5 km
        rows.append(("run", i, t(30 * i), 40.0 + deg_100m * i, -105.0, 1600.0))
    rows.append(("run", 100, t(30 * 100), 91.0, -105.0, 1600.0))
    rows.append(("run", 101, t(30 * 101), 0.0, 0.0, 1600.0))
    for i in range(15):  # 14 * 500 m = 7 km
        rows.append(("ride", i, t(60 * i), 40.0 + deg_100m * 5 * i, -105.0, -500.0))
    return spark.createDataFrame(
        rows, "activity_id string, seq long, ts timestamp, lat double, "
              "lon double, ele double"
    )


class TestAutoFixPipeline:
    def test_stage_composition_multisport(self, spark):
        points = _multisport_points(spark)
        channels = points.select(
            "activity_id", "ts", F.lit("heart_rate").alias("channel"),
            F.lit(140.0).alias("value"),
        )
        sports = spark.createDataFrame(
            [("run", "running"), ("ride", "cycling")], "activity_id string, sport string"
        )
        opts = AutoFixOptions(auto_lap_by_distance=True)
        out = auto_fix(points, channels=channels, laps=None, sports=sports,
                       options=opts)

        pts = out["points"].toPandas()
        # invalid GPS trimmed: lat 91 dropped, Null Island dropped
        assert len(pts[pts["activity_id"] == "run"]) == 26
        # sentinel elevation cleared, not dropped
        ride = pts[pts["activity_id"] == "ride"]
        assert len(ride) == 15 and ride["ele"].isna().all()

        laps = out["laps"].toPandas()
        run_laps = laps[laps["activity_id"] == "run"]
        ride_laps = laps[laps["activity_id"] == "ride"]
        # 2.5 km at 1 km splits -> 3 laps; 7 km at 5 km splits -> 2 laps
        assert len(run_laps) == 3
        assert len(ride_laps) == 2

        ch = out["channels"].toPandas()
        # recomputed distance/speed channels exist alongside heart_rate
        assert set(ch["channel"].unique()) == {"heart_rate", "distance", "speed"}
        # channel samples at trimmed timestamps are trimmed to the envelope
        run_hr = ch[(ch["activity_id"] == "run") & (ch["channel"] == "heart_rate")]
        assert len(run_hr) == 26

        codes = {(r["activity_id"], r["code"])
                 for r in out["diagnostics"].collect()}
        assert ("run", "autofix.invalid_gps.trimmed") in codes
        assert ("run", "autofix.channel_drift.trimmed") in codes
        assert ("run", "autofix.distance.recomputed") in codes
        assert ("run", "autofix.laps.auto_generated") in codes
        assert ("ride", "autofix.laps.auto_generated") in codes
        # ride had no invalid points -> no trim diag
        assert ("ride", "autofix.invalid_gps.trimmed") not in codes

    def test_only_when_missing_keeps_real_laps(self, spark):
        points = _multisport_points(spark)
        laps = spark.createDataFrame(
            [("run", 0, T0.to_pydatetime(),
              (T0 + pd.Timedelta(minutes=20)).to_pydatetime(), 2500.0)],
            "activity_id string, lap_id int, start_ts timestamp, "
            "end_ts timestamp, distance_m double",
        )
        opts = AutoFixOptions(auto_lap_by_distance=True)
        out = auto_fix(points, laps=laps, options=opts)
        res = out["laps"].toPandas()
        # run keeps its single real lap; ride (no laps) gets generated ones
        # at the default 1 km split (no sport table passed): 7 km -> 7 laps
        assert len(res[res["activity_id"] == "run"]) == 1
        assert len(res[res["activity_id"] == "ride"]) == 7

    def test_disabled_options(self, spark):
        opts = AutoFixOptions.disabled()
        assert not opts.is_enabled
        points = _multisport_points(spark)
        out = auto_fix(points, options=opts)
        # sortAndDedup still runs, but nothing is trimmed or generated
        assert out["points"].count() == points.count()
        assert out["laps"] is None

    def test_cli_convert_autofix_report(self, spark, tmp_path):
        from activity_files_spark.cli import main

        xml = (
            '<?xml version="1.0"?>\n'
            '<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">\n'
            "<trk><type>running</type><trkseg>\n"
            '<trkpt lat="40.0" lon="-105.0"><time>2024-01-10T07:00:00Z</time></trkpt>\n'
            '<trkpt lat="40.01" lon="-105.0"><time>2024-01-10T07:10:00Z</time></trkpt>\n'
            '<trkpt lat="40.02" lon="-105.0"><time>2024-01-10T07:20:00Z</time></trkpt>\n'
            "</trkseg></trk></gpx>\n"
        )
        d = tmp_path / "in"
        d.mkdir()
        (d / "a.gpx").write_text(xml)
        rep = str(tmp_path / "rep")
        rc = main([
            "convert", "--input", str(d), "--from", "auto", "--to", "tcx",
            "--output", str(tmp_path / "out"), "--autofix", "--auto-lap",
            "--report", rep,
        ])
        assert rc == 0
        codes = {r["code"] for r in spark.read.parquet(rep).collect()}
        # distance/speed recomputed (source had no distance channel) and the
        # 10-min gaps filled; TCX keeps laps, so no lossy.laps_dropped
        assert "autofix.distance.recomputed" in codes
        assert "lossy.laps_dropped" not in codes
        # the GPX trkseg lap is a "Segment" placeholder -> auto-lap
        # regenerated distance splits, and they reach the encoded TCX
        assert "autofix.laps.auto_generated" in codes
        xml = spark.read.parquet(str(tmp_path / "out")).first()["xml"]
        assert xml.count("<Lap StartTime=") >= 2

    def test_trim_diag_not_cancelled_by_gap_fill(self, spark):
        # 2 invalid points removed AND a 10-min gap filled (+9 synthetic
        # points): the trimmed-point diagnostic must still report 2 (it is
        # measured at the trim stage boundary, not after insertions)
        rows = [
            ("g", 0, T0.to_pydatetime(), 40.0, -105.0, 1600.0),
            ("g", 1, (T0 + pd.Timedelta(minutes=10)).to_pydatetime(),
             40.01, -105.0, 1610.0),
            ("g", 2, (T0 + pd.Timedelta(minutes=11)).to_pydatetime(),
             91.0, -105.0, 1610.0),
            ("g", 3, (T0 + pd.Timedelta(minutes=12)).to_pydatetime(),
             0.0, 0.0, 1610.0),
        ]
        points = spark.createDataFrame(
            rows, "activity_id string, seq long, ts timestamp, lat double, "
                  "lon double, ele double"
        )
        out = auto_fix(points, options=AutoFixOptions())
        assert out["points"].count() > 4  # gap-filled
        diags = {r["code"]: r["message"] for r in out["diagnostics"].collect()}
        assert diags["autofix.invalid_gps.trimmed"].startswith(
            "Auto-fix removed 2 ")

    def test_no_spurious_channel_drift_diag(self, spark):
        # a source speed channel inside the envelope is REPLACED by
        # recompute, not trimmed — no channel_drift diagnostic
        points = _multisport_points(spark).filter(F.col("activity_id") == "ride")
        channels = points.select(
            "activity_id", "ts", F.lit("speed").alias("channel"),
            F.lit(2.5).alias("value"),
        )
        out = auto_fix(points, channels=channels, options=AutoFixOptions())
        codes = {r["code"] for r in out["diagnostics"].collect()}
        assert "autofix.channel_drift.trimmed" not in codes
        # and distance.recomputed IS emitted (no prior distance channel)
        assert "autofix.distance.recomputed" in codes

    def test_placeholder_lap_single_point_activity_keeps_laps(self, spark):
        # all-placeholder laps but < 2 points: regeneration is impossible,
        # so the original lap must survive instead of vanishing
        points = spark.createDataFrame(
            [("solo", 0, T0.to_pydatetime(), 40.0, -105.0, 1600.0)],
            "activity_id string, seq long, ts timestamp, lat double, "
            "lon double, ele double",
        )
        laps = spark.createDataFrame(
            [("solo", 0, T0.to_pydatetime(),
              (T0 + pd.Timedelta(minutes=5)).to_pydatetime(), 100.0,
              {"name": "Segment 1"})],
            "activity_id string, lap_id int, start_ts timestamp, "
            "end_ts timestamp, distance_m double, attrs map<string,string>",
        )
        out = auto_fix(points, laps=laps,
                       options=AutoFixOptions(auto_lap_by_distance=True))
        res = out["laps"].toPandas()
        assert len(res) == 1 and res.iloc[0]["distance_m"] == 100.0

    def test_gap_fill_respects_threshold(self, spark):
        rows = [
            ("g", 0, T0.to_pydatetime(), 40.0, -105.0, 1600.0),
            ("g", 1, (T0 + pd.Timedelta(minutes=10)).to_pydatetime(),
             40.01, -105.0, 1610.0),
        ]
        points = spark.createDataFrame(
            rows, "activity_id string, seq long, ts timestamp, lat double, "
                  "lon double, ele double"
        )
        out = auto_fix(points, options=AutoFixOptions())
        filled = out["points"].toPandas().sort_values("ts")
        assert len(filled) > 2  # synthetic points inserted into the 10-min gap
        assert filled["seq"].isna().sum() == len(filled) - 2
