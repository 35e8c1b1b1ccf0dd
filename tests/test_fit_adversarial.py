"""Adversarial FIT payloads — handcrafted malformed byte patterns beyond
what test_property_based.py randomizes, ported from the reference's
fit_problem_files / fit_definition_robustness strategy
(test/helpers/fit_helpers.dart:119-144, fit_diagnostics_test.dart:90-101,
fit_parser.dart:266-315): truncated definitions and data, oversized and
non-multiple field sizes, interleaved developer-field re-registration,
unknown-definition garbage, context-less compressed timestamps, and
deterministic header+garbage fuzz. The contract under test is
diag-not-throw plus the best-effort recovery counters: parse_fit must
return a record list for EVERY input here, never raise, and keep decoding
whatever follows the damage.
"""

import random
import struct

from activity_files_spark.sources.fit import (
    _def_record,
    encode_fit,
    fit_crc16,
    parse_fit,
)

T0 = 1_000_000_000  # FIT seconds, a 2021 timestamp (passes plausibility)

REC_DEF3 = [(253, 4, 0x86), (0, 4, 0x85), (1, 4, 0x85)]  # ts + lat + lon


def _payload(body: bytes) -> bytes:
    header = struct.pack("<BBHI4s", 14, 0x20, 2140, len(body), b".FIT")
    header += struct.pack("<H", fit_crc16(header))
    blob = header + body
    return blob + struct.pack("<H", fit_crc16(blob))


def _semi(deg: float) -> int:
    return int(deg * (2**31) / 180.0)


def _rec(local: int, ts: int, lat: float = 47.0, lon: float = 11.0) -> bytes:
    return bytes([local]) + struct.pack("<Iii", ts, _semi(lat), _semi(lon))


def _points(recs):
    return [r for r in recs if r["kind"] == "point"]


def _codes(recs):
    return [r["attrs"]["code"] for r in recs if r["kind"] == "diag"]


def test_truncated_definition_field_table():
    """Definition cut mid-field-table: fit.def.truncated diag, records
    decoded before the damage survive, no exception."""
    body = bytearray()
    body += _def_record(0, 20, REC_DEF3)
    body += _rec(0, T0) + _rec(0, T0 + 1)
    # definition header claiming 5 fields but providing only 1.5
    body += bytes([0x41, 0, 0]) + struct.pack("<H", 18) + bytes([5])
    body += bytes([253, 4, 0x86, 9])  # cut mid second field
    recs = parse_fit("a", _payload(bytes(body)))
    assert len(_points(recs)) == 2
    assert "fit.def.truncated" in _codes(recs)


def test_truncated_data_record():
    """Payload ends mid-data-record: fit.data.truncated diag, earlier
    records kept."""
    body = bytearray()
    body += _def_record(0, 20, REC_DEF3)
    body += _rec(0, T0)
    body += _rec(0, T0 + 1)[:6]  # half a record
    recs = parse_fit("a", _payload(bytes(body)))
    assert len(_points(recs)) == 1
    assert "fit.data.truncated" in _codes(recs)


def test_missing_trailer_crc():
    """Header promises more bytes than the file holds (no trailer):
    fit.trailer.truncated, best-effort decode of what exists."""
    body = _def_record(0, 20, REC_DEF3) + _rec(0, T0) + _rec(0, T0 + 1)
    header = struct.pack("<BBHI4s", 14, 0x20, 2140, len(body) + 64, b".FIT")
    header += struct.pack("<H", fit_crc16(header))
    recs = parse_fit("a", header + body)  # no CRC trailer at all
    assert "fit.trailer.truncated" in _codes(recs)
    assert len(_points(recs)) == 2


def test_oversized_field_size_past_payload_end():
    """A definition whose declared record size overruns the payload:
    fit.data.truncated on the data message, no throw."""
    body = bytearray()
    body += _def_record(0, 20, REC_DEF3)
    body += _rec(0, T0)
    body += _def_record(1, 20, [(253, 4, 0x86), (2, 200, 0x84)])  # 200-byte field
    body += bytes([0x01]) + struct.pack("<I", T0 + 1) + b"\x00" * 10  # short
    recs = parse_fit("a", _payload(bytes(body)))
    assert len(_points(recs)) == 1
    assert "fit.data.truncated" in _codes(recs)


def test_non_multiple_field_size_keeps_alignment():
    """Field size 7 on a uint32 base (1.75 elements): the reader must
    advance by the DECLARED size, so the explicit lat/lon that follow stay
    aligned (fit_definition_robustness_test.dart's array-advance rule,
    generalized to a non-multiple size)."""
    body = bytearray()
    # altitude (2) declared 7 bytes wide, placed BEFORE lat/lon
    body += _def_record(0, 20, [(253, 4, 0x86), (2, 7, 0x84),
                                (0, 4, 0x85), (1, 4, 0x85)])
    body += (bytes([0x00]) + struct.pack("<I", T0) + b"\x07" * 7
             + struct.pack("<ii", _semi(40.0), _semi(-105.0)))
    recs = parse_fit("a", _payload(bytes(body)))
    pts = _points(recs)
    assert len(pts) == 1
    assert abs(pts[0]["lat"] - 40.0) < 1e-6
    assert abs(pts[0]["lon"] + 105.0) < 1e-6


def test_dev_field_re_registration_mid_stream():
    """A field_description that RE-registers the same (developer_index,
    field_num) mid-stream with a new scale must apply to subsequent records
    only — the cached fast-path plan is versioned, not keyed on
    len(dev_fields) (round-4 fix, kept honest here)."""
    def fd_206(name: bytes, scale: int) -> bytes:
        # 206 def: 0 dev_index u8, 1 field_num u8, 2 base_type u8,
        # 3 name string(8), 6 scale u8
        d = _def_record(2, 206, [(0, 1, 0x02), (1, 1, 0x02), (2, 1, 0x02),
                                 (3, 8, 0x07), (6, 1, 0x02)])
        return d + bytes([0x02, 0, 1, 0x02]) + name.ljust(8, b"\x00") + bytes([scale])

    rec_def = _def_record(0, 20, REC_DEF3, dev_fields=[(1, 1, 0)])

    def rec_dev(ts: int, raw: int) -> bytes:
        return _rec(0, ts) + bytes([raw])

    body = bytearray()
    body += fd_206(b"grit", 1)       # scale 1 -> raw value
    body += rec_def
    body += rec_dev(T0, 40)
    body += fd_206(b"grit", 4)       # RE-registration: scale 4
    body += rec_dev(T0 + 1, 40)
    recs = parse_fit("a", _payload(bytes(body)))
    grit = [r["value"] for r in recs
            if r["kind"] == "channel" and r["channel"] == "grit"]
    assert grit == [40.0, 10.0]
    assert not [c for c in _codes(recs) if "error" in c]


def test_unknown_definition_resyncs_and_recovers_tail():
    """Garbage data message referencing a never-defined local type, followed
    by a fresh valid definition+records: unknown_definition diag, stream
    resync, tail records recovered (fit_parser.dart:266-315 + the ad0c554
    recovery counters)."""
    body = bytearray()
    body += _def_record(0, 20, REC_DEF3)
    body += _rec(0, T0)
    body += bytes([0x07]) + b"\xde\xad\xbe\xef" * 3  # local 7 never defined
    body += _def_record(1, 20, REC_DEF3)
    body += _rec(1, T0 + 10) + _rec(1, T0 + 11)
    recs = parse_fit("a", _payload(bytes(body)))
    assert "fit.data.unknown_definition" in _codes(recs)
    # the record before the garbage plus the two after resync
    assert len(_points(recs)) >= 3
    meta = [r for r in recs if r["kind"] == "meta"][0]
    assert int(meta["attrs"].get("integrity.invalid_messages", "0")) >= 1


def test_compressed_timestamp_without_context():
    """A compressed-header record before ANY timestamp context: the point
    can't be timestamped — diag-not-throw, and later explicit-ts records
    still parse."""
    body = bytearray()
    body += _def_record(0, 20, [(0, 4, 0x85), (1, 4, 0x85)])  # no ts field
    body += bytes([0x80 | 0x05]) + struct.pack("<ii", _semi(1.0), _semi(2.0))
    body += _def_record(1, 20, REC_DEF3)
    body += _rec(1, T0)
    recs = parse_fit("a", _payload(bytes(body)))
    pts = _points(recs)
    assert len(pts) >= 1  # the explicit-ts record always survives
    assert any(c.startswith("fit.record.") for c in _codes(recs)) or len(pts) == 2


def test_zero_field_definition_is_harmless():
    body = bytearray()
    body += bytes([0x43, 0, 0]) + struct.pack("<H", 18) + bytes([0])  # 0 fields
    body += bytes([0x03])  # its (empty) data record
    body += _def_record(0, 20, REC_DEF3)
    body += _rec(0, T0)
    recs = parse_fit("a", _payload(bytes(body)))
    assert len(_points(recs)) == 1


def test_header_plus_garbage_fuzz_never_raises():
    """Valid header + deterministic random bodies: the diagnostics-only
    contract holds for arbitrary bytes (linear-time resync, no exception,
    always a meta record in report mode)."""
    for seed in range(25):
        rng = random.Random(seed)
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 600)))
        recs = parse_fit("fuzz", _payload(body))
        assert isinstance(recs, list)
        assert [r for r in recs if r["kind"] == "meta"]


def test_strict_mode_raises_silent_mode_suppresses():
    """Integrity-mode parity on a damaged file: strict raises ValueError,
    report diags, silent returns data with zero diag rows."""
    body = _def_record(0, 20, REC_DEF3) + _rec(0, T0) + _rec(0, T0 + 1)[:6]
    blob = _payload(bytes(body))
    import pytest

    with pytest.raises(ValueError):
        parse_fit("a", blob, integrity="strict")
    report = parse_fit("a", blob, integrity="report")
    assert "fit.data.truncated" in _codes(report)
    silent = parse_fit("a", blob, integrity="silent")
    assert _codes(silent) == []
    assert len(_points(silent)) == 1


def test_roundtrip_of_real_encoder_after_bit_damage():
    """Flip bytes inside a real encoder output at deterministic offsets:
    the parser must stay diag-not-throw on every corruption."""
    import datetime as dt

    pts = [{"ts": dt.datetime(2024, 3, 1, 10, 0, i), "lat": 40.0 + i * 1e-4,
            "lon": -105.0 - i * 1e-4, "ele": 1600.0 + i} for i in range(20)]
    blob = bytearray(encode_fit(pts, {}, []))
    for off in range(20, len(blob), max(7, len(blob) // 40)):
        damaged = bytearray(blob)
        damaged[off] ^= 0xA5
        recs = parse_fit("dmg", bytes(damaged))
        assert isinstance(recs, list)


def test_diags_carry_priority_fix_and_node():
    """ParseDiagnostic parity (fit_parser.dart): every structural FIT diag
    carries the reference's priority tier, a suggested fix, and the node
    path derived from its code."""
    body = _def_record(0, 20, REC_DEF3) + _rec(0, T0) + _rec(0, T0 + 1)[:6]
    recs = parse_fit("a", _payload(bytes(body)))
    d = [r for r in recs if r["kind"] == "diag"
         and r["attrs"]["code"] == "fit.data.truncated"][0]["attrs"]
    assert d["priority"] == "0" and d["node"] == "fit.data" and d["fix"]
    # recovery diags are the lowest-priority tier (3), matching the reference
    body2 = bytearray()
    body2 += _def_record(0, 20, REC_DEF3)
    body2 += _rec(0, T0)
    inv = 0xFFFFFFFF
    body2 += bytes([0x00]) + struct.pack("<Iii", inv, _semi(1.0), _semi(1.0))
    recs2 = parse_fit("a", _payload(bytes(body2)))
    rec_d = [r for r in recs2 if r["kind"] == "diag"
             and r["attrs"]["code"] == "fit.record.recovered_timestamp"]
    assert rec_d and rec_d[0]["attrs"]["priority"] == "3"
