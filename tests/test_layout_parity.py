"""Physical layout: bucketed joins eliminate shuffles; cell-partitioned
writes prune partitions. Plus deep-cut parity: FIT set/length messages,
GPX multi-track."""

import pytest
from pyspark.sql import functions as F

from activity_files_spark.plans.layout import write_bucketed, write_cell_partitioned


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import shutil

    spark.sql("DROP TABLE IF EXISTS pts_b")
    spark.sql("DROP TABLE IF EXISTS ch_b")
    shutil.rmtree("/tmp/spark_test_warehouse", ignore_errors=True)
    pts = spark.range(1000).select(
        F.col("id").alias("activity_id"), (F.col("id") % 7).alias("x")
    )
    ch = spark.range(1000).select(
        F.col("id").alias("activity_id"), (F.col("id") % 5).alias("v")
    )
    write_bucketed(pts, "pts_b", "activity_id", n_buckets=8)
    write_bucketed(ch, "ch_b", "activity_id", n_buckets=8)
    # force the shuffle-join path so bucketing (not broadcast) is what
    # eliminates the exchange — at 100 TB neither side broadcasts
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("pts_b").join(spark.table("ch_b"), "activity_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_asof_cogroup_has_no_shuffle(spark):
    """The 100 TB claim in layout.py's docstring, proven for the COGROUP
    as-of path (not just equi-joins): points and channels bucketed on
    activity_id feed asof_channels_wide's FlatMapCoGroupsInPandas with no
    Exchange on either side — bucketing satisfies the cogroup's clustered
    distribution, leaving only within-partition sorts."""
    from activity_files_spark.operators.asof import asof_channels_wide

    for t in ("pts_asof_b", "ch_asof_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    pts = spark.range(1000).select(
        (F.col("id") % 50).cast("string").alias("activity_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )
    ch = spark.range(3000).select(
        (F.col("id") % 50).cast("string").alias("activity_id"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") % 900)).alias("ts"),
        F.lit("heart_rate").alias("channel"),
        (F.col("id") % 200).cast("double").alias("value"),
    )
    write_bucketed(pts, "pts_asof_b", "activity_id", n_buckets=8)
    write_bucketed(ch, "ch_asof_b", "activity_id", n_buckets=8)
    out = asof_channels_wide(
        spark.table("pts_asof_b"), spark.table("ch_asof_b"),
        ["heart_rate"], default_tolerance_s=5.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "Exchange" not in plan, plan  # co-located: zero shuffles
    assert "Bucketed: true" in plan
    assert out.count() == 1000


def test_cell_partitioned_write_prunes(spark, tmp_path):
    from activity_files_spark.data.images import synth_images
    from activity_files_spark.operators.tiling import tile_assign

    tiles = tile_assign(synth_images(spark, 50, partitions=2), resolutions=[8, 12]).select(
        "image_id", "zoom", "cell_id"
    )
    path = str(tmp_path / "tiles")
    write_cell_partitioned(tiles, path)
    back = spark.read.parquet(path)
    assert back.count() == 100
    pruned = back.filter(F.col("zoom") == 8)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter present on zoom (directory pruning)
    assert back.filter(F.col("zoom") == 8).count() == 50


def test_fit_set_and_length_messages():
    import struct

    from activity_files_spark.sources.fit import (
        FIT_EPOCH_UNIX,
        _def_record,
        fit_crc16,
        parse_fit,
    )

    # hand-build a FIT body: length (101) + set (225) messages
    body = bytearray()
    # FIT-profile fields: 7 = swim_stroke, 12 = length_type (0 idle/1 active)
    body += _def_record(0, 101, [(253, 4, 0x86), (2, 4, 0x86), (3, 4, 0x86), (5, 2, 0x84), (7, 1, 0x00), (12, 1, 0x00)])
    t0 = 1_000_000_000
    body += bytes([0x00]) + struct.pack("<IIIHBB", t0 + 30, t0, 30000, 24, 1, 1)
    body += _def_record(1, 225, [(254, 4, 0x86), (6, 4, 0x86), (3, 2, 0x84), (4, 2, 0x84), (0, 4, 0x86)])
    body += bytes([0x01]) + struct.pack("<IIHHI", t0 + 90, t0 + 60, 12, 800, 30000)
    header = struct.pack("<BBHI4s", 14, 0x20, 2140, len(body), b".FIT")
    header += struct.pack("<H", fit_crc16(header))
    blob = header + bytes(body)
    payload = blob + struct.pack("<H", fit_crc16(blob))

    recs = parse_fit("a", payload)
    lengths = [r for r in recs if r["kind"] == "length"]
    sets = [r for r in recs if r["kind"] == "set"]
    assert len(lengths) == 1 and len(sets) == 1
    la = dict(lengths[0]["attrs"])
    assert la["total_elapsed_s"] == "30.0" and la["total_strokes"] == "24"
    assert la["swim_stroke"] == "1"  # backstroke wire value (field 7)
    assert la["length_type"] == "1"  # active (field 12)
    sa = dict(sets[0]["attrs"])
    assert sa["repetitions"] == "12"
    assert sa["weight_kg"] == "50.0"  # 800 / 16
    assert sa["duration_s"] == "30.0"


def test_fit_activity_message_34():
    """Activity (34) handler parity (fit_parser.dart:769-776): field 0
    total_timer_time is the timer fallback — the primary session's field 8
    wins regardless of message order — plus surfaced num_sessions and the
    local-timestamp UTC offset; all three round-trip through the encoder."""
    import struct

    from activity_files_spark.sources.fit import (
        _def_record,
        encode_fit,
        fit_crc16,
        parse_fit,
    )

    def build(session_timer_raw):
        body = bytearray()
        # session: sport running, elapsed 60s, timer (maybe), distance 1km
        body += _def_record(0, 18, [(253, 4, 0x86), (5, 1, 0x00),
                                    (7, 4, 0x86), (8, 4, 0x86), (9, 4, 0x86)])
        t0 = 1_000_000_000
        body += bytes([0x00]) + struct.pack(
            "<IBIII", t0, 1, 60000, session_timer_raw, 100000)
        # activity: timer 45.5s, 2 sessions, local ts = utc + 7200 (UTC+2)
        body += _def_record(1, 34, [(253, 4, 0x86), (0, 4, 0x86),
                                    (1, 2, 0x84), (5, 4, 0x86)])
        body += bytes([0x01]) + struct.pack("<IIHI", t0, 45500, 2, t0 + 7200)
        header = struct.pack("<BBHI4s", 14, 0x20, 2140, len(body), b".FIT")
        header += struct.pack("<H", fit_crc16(header))
        blob = header + bytes(body)
        return blob + struct.pack("<H", fit_crc16(blob))

    # session carries no timer (invalid sentinel) -> activity's wins
    meta = [r for r in parse_fit("a", build(0xFFFFFFFF)) if r["kind"] == "meta"][0]
    a = meta["attrs"]
    assert a["session.total_timer_s"] == "45.5"
    assert a["activity.total_timer_s"] == "45.5"
    assert a["activity.num_sessions"] == "2"
    assert a["activity.local_ts_offset_s"] == "7200"
    # session timer present -> session wins (fit_parser.dart:609-612, 773)
    meta2 = [r for r in parse_fit("a", build(30250)) if r["kind"] == "meta"][0]
    assert meta2["attrs"]["session.total_timer_s"] == "30.25"
    assert meta2["attrs"]["activity.total_timer_s"] == "45.5"
    # encoder re-emits msg 34 + session field 8: full round-trip
    blob2 = encode_fit([], {}, [], meta=dict(a))
    back = [r for r in parse_fit("b", blob2) if r["kind"] == "meta"][0]["attrs"]
    assert back["session.total_timer_s"] == "45.5"
    assert back["activity.num_sessions"] == "2"
    # no points -> activity ts is the invalid sentinel -> offset not derivable
    assert "activity.local_ts_offset_s" not in back
    # with a point the UTC offset round-trips through local_timestamp
    import pandas as pd
    pt = [{"seq": 0, "ts": pd.Timestamp("2024-03-01T10:00:00"),
           "lat": 40.0, "lon": -105.0, "ele": None}]
    blob3 = encode_fit(pt, {}, [], meta=dict(a))
    back3 = [r for r in parse_fit("c", blob3) if r["kind"] == "meta"][0]["attrs"]
    assert back3["activity.local_ts_offset_s"] == "7200"


def test_gpx_multi_track_concatenates(spark):
    from activity_files_spark.sources.gpx import gpx_records
    from activity_files_spark.sources.records import laps_of, points_of

    xml = """<?xml version="1.0"?><gpx version="1.1" creator="t"
      xmlns="http://www.topografix.com/GPX/1/1">
      <trk><name>t1</name><trkseg>
        <trkpt lat="40.0" lon="-105.0"><time>2024-03-01T10:00:00Z</time></trkpt>
        <trkpt lat="40.0005" lon="-105.0005"><time>2024-03-01T10:00:10Z</time></trkpt>
      </trkseg></trk>
      <trk><name>t2</name><trkseg>
        <trkpt lat="41.0" lon="-106.0"><time>2024-03-01T11:00:00Z</time></trkpt>
      </trkseg></trk>
    </gpx>"""
    rec = gpx_records(
        spark.createDataFrame([("m", xml)], "activity_id string, xml string")
    ).cache()
    pts = points_of(rec).orderBy("seq").collect()
    assert len(pts) == 3
    assert [p["seq"] for p in pts] == [0, 1, 2]  # continuous across tracks
    assert len(laps_of(rec).collect()) == 2  # one lap per trkseg
