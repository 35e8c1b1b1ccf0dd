"""FIT codec: scale/sentinel constants pinned (fit_parser.dart:1213-1365),
CRC-16, round-trip through the encoder; format auto-detection."""

import struct
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from activity_files_spark.sources.detect import detect_format_df, detect_format_py
from activity_files_spark.sources.fit import (
    FIT_EPOCH_UNIX,
    encode_fit,
    fit_crc16,
    fit_encode_df,
    fit_records,
    parse_fit,
    _sanitize_dev_name,
)
from activity_files_spark.sources.records import (
    channels_of,
    diagnostics_of,
    laps_of,
    points_of,
)

TS0 = datetime(2024, 3, 1, 10, 0, 0)
PTS = [
    {"ts": TS0, "lat": 40.0, "lon": -105.0, "ele": 1600.0},
    {"ts": datetime(2024, 3, 1, 10, 0, 10), "lat": 40.0005, "lon": -105.0005, "ele": 1601.0},
    {"ts": datetime(2024, 3, 1, 10, 0, 20), "lat": 40.001, "lon": -105.001, "ele": 1602.0},
]


def mk_channels():
    from activity_files_spark.sources.gpx import _ts_key

    hr = [140, 142, 145]
    cad = [82, 84, 86]
    return {
        _ts_key(p["ts"]): {"heart_rate": float(h), "cadence": float(c)}
        for p, h, c in zip(PTS, hr, cad)
    }


def test_crc16_known_properties():
    assert fit_crc16(b"") == 0
    # self-check: appending the CRC little-endian yields a stream whose
    # total CRC is 0 (standard FIT check)
    data = b"hello fit world"
    crc = fit_crc16(data)
    assert fit_crc16(data + struct.pack("<H", crc)) == 0


def test_fit_roundtrip_canonical():
    laps = [{"start_ts": PTS[0]["ts"], "end_ts": PTS[-1]["ts"], "distance_m": 140.0}]
    payload = encode_fit(PTS, mk_channels(), laps)
    recs = parse_fit("act_000", payload)
    diags = [r for r in recs if r["kind"] == "diag"]
    assert diags == []
    pts = [r for r in recs if r["kind"] == "point"]
    assert len(pts) == 3
    # semicircle quantization: ~1e-7 deg resolution
    for got, want in zip(pts, PTS):
        assert abs(got["lat"] - want["lat"]) < 1e-6
        assert abs(got["lon"] - want["lon"]) < 1e-6
        assert abs(got["ele"] - want["ele"]) < 0.2  # alt raw = 1/5 m steps
        assert got["ts"] == want["ts"]
    hr = [r["value"] for r in recs if r["kind"] == "channel" and r["channel"] == "heart_rate"]
    assert hr == [140.0, 142.0, 145.0]
    lap = [r for r in recs if r["kind"] == "lap"][0]
    assert lap["start_ts"] == PTS[0]["ts"] and lap["end_ts"] == PTS[-1]["ts"]
    assert lap["distance_m"] == 140.0
    assert dict(lap["attrs"])["total_elapsed_s"] == "20.0"


def test_fit_sentinels_decode_to_null():
    # point with invalid altitude + missing channels: sentinel bytes
    pts = [{"ts": TS0, "lat": 40.0, "lon": -105.0, "ele": None}]
    payload = encode_fit(pts, {}, [])
    recs = parse_fit("a", payload)
    p = [r for r in recs if r["kind"] == "point"][0]
    assert p["ele"] is None  # 0xFFFF altitude sentinel -> null
    chans = [r for r in recs if r["kind"] == "channel"]
    assert chans == []  # all channel sentinels suppressed


def test_fit_corrupt_inputs_are_diags():
    assert parse_fit("a", b"")[0]["attrs"]["code"] == "fit.header.too_short"
    bad_magic = bytes([14, 0x20]) + b"\x00" * 12
    assert parse_fit("a", bad_magic)[0]["attrs"]["code"] == "fit.header.bad_magic"
    # corrupt the file CRC of a valid payload
    payload = bytearray(encode_fit(PTS, {}, []))
    payload[-1] ^= 0xFF
    codes = [r["attrs"]["code"] for r in parse_fit("a", bytes(payload)) if r["kind"] == "diag"]
    assert "fit.trailer.crc_mismatch" in codes
    # truncated mid-record still yields prior points + diagnostic
    valid = encode_fit(PTS, {}, [])
    recs = parse_fit("a", valid[: len(valid) // 2])
    codes = [r["attrs"]["code"] for r in recs if r["kind"] == "diag"]
    assert codes  # some truncation diagnostic
    assert not any(r["kind"] == "point" and r["ts"] is None for r in recs)


def test_fit_epoch_constant():
    # 1989-12-31T00:00:00Z
    assert FIT_EPOCH_UNIX == 631065600
    payload = encode_fit([{"ts": datetime(1990, 1, 1), "lat": 0.5, "lon": 0.5, "ele": 0.0}], {}, [])
    p = [r for r in parse_fit("a", payload) if r["kind"] == "point"][0]
    assert p["ts"] == datetime(1990, 1, 1)


def test_dev_name_sanitization():
    assert _sanitize_dev_name("Stryd Power", 0, 1) == "stryd_power"
    assert _sanitize_dev_name("3dpower", 0, 2) == "fit_dev_0_2"
    assert _sanitize_dev_name("__Weird--Name__", 1, 3) == "weird_name"
    assert _sanitize_dev_name("", 2, 4) == "fit_dev_2_4"


def test_fit_spark_roundtrip(spark):
    pts_df = spark.createDataFrame(
        [("act_000", p["ts"], p["lat"], p["lon"], p["ele"]) for p in PTS],
        "activity_id string, ts timestamp, lat double, lon double, ele double",
    )
    ch_df = spark.createDataFrame(
        [("act_000", p["ts"], "heart_rate", float(h)) for p, h in zip(PTS, [140, 142, 145])],
        "activity_id string, ts timestamp, channel string, value double",
    )
    enc = fit_encode_df(pts_df, ch_df).collect()
    assert len(enc) == 1
    files = spark.createDataFrame(
        [("act_000", bytes(enc[0]["payload"]))], "activity_id string, payload binary"
    )
    rec = fit_records(files).cache()
    assert points_of(rec).count() == 3
    hr = sorted(r["value"] for r in channels_of(rec).filter(F.col("channel") == "heart_rate").collect())
    assert hr == [140.0, 142.0, 145.0]
    assert diagnostics_of(rec).count() == 0


def test_detect_format():
    assert detect_format_py(b"", "ride.GPX") == "gpx"
    assert detect_format_py(b"<?xml?><gpx></gpx>") == "gpx"
    assert detect_format_py(b"<TrainingCenterDatabase/>") == "tcx"
    assert detect_format_py(b'{"type":"FeatureCollection","features":[]}') == "geojson"
    assert detect_format_py(b"timestamp,latitude,longitude\n2024,40,-105\n") == "csv"
    fit = encode_fit(PTS, {}, [])
    assert detect_format_py(fit) == "fit"
    import base64

    assert detect_format_py(base64.b64encode(fit)) == "fit"
    # BOM-prefixed utf-16 GPX
    xml16 = '<?xml version="1.0"?><gpx/>'.encode("utf-16")  # includes BOM
    assert detect_format_py(xml16) == "gpx"
    assert detect_format_py(b"random noise 1234") is None


def test_detect_format_df(spark):
    fit = encode_fit(PTS, {}, [])
    rows = [
        ("a.bin", b"<gpx/>"),
        ("b.bin", fit),
        ("c.csv", b"x"),  # extension wins
    ]
    df = spark.createDataFrame(rows, "path string, payload binary")
    got = {r["path"]: r["fmt"] for r in detect_format_df(df).collect()}
    assert got == {"a.bin": "gpx", "b.bin": "fit", "c.csv": "csv"}


def test_fit_array_valued_fields_never_throw():
    """Regression: a definition declaring array fields (n>1) must produce
    diagnostics/partial data, never a TypeError that kills the task."""
    # record def with ARRAY timestamp (2x uint32) and array hr (2x uint8)
    body = bytearray()
    body += _def_record_local(0, 20, [(253, 8, 0x86), (3, 2, 0x02), (0, 4, 0x85), (1, 4, 0x85)])
    t0 = 1_000_000_000
    body += bytes([0x00]) + struct.pack("<IIBBii", t0, t0 + 1, 140, 141,
                                        477625322, -1253632716)
    recs = parse_fit("a", _payload_of(bytes(body)))
    # array ts -> first element used; array hr -> first element
    pts = [r for r in recs if r["kind"] == "point"]
    assert len(pts) == 1
    hr = [r for r in recs if r["kind"] == "channel" and r["channel"] == "heart_rate"]
    assert hr and hr[0]["value"] == 140.0


def _def_record_local(local, global_num, fields):
    from activity_files_spark.sources.fit import _def_record

    return _def_record(local, global_num, fields)


def _payload_of(body: bytes) -> bytes:
    header = struct.pack("<BBHI4s", 14, 0x20, 2140, len(body), b".FIT")
    header += struct.pack("<H", fit_crc16(header))
    blob = header + body
    return blob + struct.pack("<H", fit_crc16(blob))
