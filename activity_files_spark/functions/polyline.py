"""Google Encoded Polyline (precision-5) as a RELATIONAL codec.

The industry-standard compact route encoding (Google Maps / OSRM /
Valhalla interchange): each coordinate is rounded to 1e-5 degrees,
delta-encoded against the previous point, zigzag-mapped to unsigned,
split into 5-bit chunks low-first with a continuation bit, and emitted
as ``chr(chunk + 63)``. Spec: Google "Encoded Polyline Algorithm
Format" (public). Not in the reference (it ships whole GPX/TCX files);
this is the wire format a 10^12-row route corpus would actually store.

The twist here: the ENCODER is pure relational algebra in both engines —
no kernel, no UDF. The per-point character group is a fixed unrolled
expression (6 chunks cover any delta within ±2^30, i.e. any pair of
points on Earth at 1e-5 precision), built once as a Column tree
(:func:`chunks_col`) and once as the identical SQL string
(:func:`chunks_sql`); the per-route string is then an ordered
aggregation of groups. Integer rounding, zigzag, masking, and chr() are
all engine-portable exact operations, so the emitted STRING hash-gates
across Spark and DuckDB.

The decoder (:func:`decode_polyline`) is scalar python for round-trip
tests — decode is inherently a sequential varint walk and is not needed
in the scale path (consumers decode per row at render time).

At 10^12 points: encode is a lag window + string agg per route — one
shuffle on the route key, everything inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 6 chunks * 5 bits = 30 bits: |zigzag(delta)| < 2^30 covers any delta
# (max |delta| for lat/lon at 1e-5 is 36_000_000 < 2^26, zigzag doubles)
N_CHUNKS = 6


def e5_col(deg: Column) -> Column:
    """Degrees -> rounded 1e-5 integer (the spec's half-up rounding)."""
    return F.round(deg * F.lit(100000.0), 0).cast("long")


def e5_sql(deg: str) -> str:
    return f"CAST(ROUND(({deg}) * 100000.0, 0) AS BIGINT)"


def zigzag_col(d: Column) -> Column:
    return F.when(d >= 0, d * 2).otherwise(-d * 2 - 1)


def zigzag_sql(d: str) -> str:
    return f"(CASE WHEN {d} >= 0 THEN {d} * 2 ELSE -{d} * 2 - 1 END)"


def chunks_col(z: Column) -> Column:
    """Unrolled 5-bit chunk group for one zigzagged delta (Column tree).

    chunk_i = (z >> 5i) & 31; emitted iff i == 0 or z >= 2^(5i); the
    continuation bit (0x20) is set iff a later chunk follows."""
    parts = []
    for i in range(N_CHUNKS):
        shifted = F.shiftrightunsigned(z, 5 * i) if i else z
        chunk = shifted.bitwiseAND(F.lit(31))
        has_more = F.shiftrightunsigned(z, 5 * (i + 1)) > 0
        emitted = chunk + F.when(has_more, F.lit(32)).otherwise(F.lit(0)) + F.lit(63)
        ch = F.char(emitted)
        if i == 0:
            parts.append(ch)
        else:
            parts.append(
                F.when(F.shiftrightunsigned(z, 5 * i) > 0, ch).otherwise(F.lit(""))
            )
    return F.concat(*parts)


def chunks_sql(z: str) -> str:
    parts = []
    for i in range(N_CHUNKS):
        shifted = z if i == 0 else f"({z} >> {5 * i})"
        emitted = (
            f"(({shifted}) & 31) + (CASE WHEN ({z} >> {5 * (i + 1)}) > 0 "
            f"THEN 32 ELSE 0 END) + 63"
        )
        if i == 0:
            parts.append(f"CHR(CAST({emitted} AS INT))")
        else:
            parts.append(
                f"(CASE WHEN ({z} >> {5 * i}) > 0 "
                f"THEN CHR(CAST({emitted} AS INT)) ELSE '' END)"
            )
    return " || ".join(parts)


def decode_polyline(s: str, precision: int = 5):
    """Scalar decoder (round-trip tests): polyline string -> [(lat, lon)]."""
    coords = []
    idx = 0
    lat = lng = 0
    scale = 10.0 ** precision
    while idx < len(s):
        vals = []
        for _ in range(2):
            result = 0
            shift = 0
            while True:
                b = ord(s[idx]) - 63
                idx += 1
                result |= (b & 0x1F) << shift
                shift += 5
                if b < 0x20:
                    break
            vals.append(~(result >> 1) if result & 1 else (result >> 1))
        lat += vals[0]
        lng += vals[1]
        coords.append((lat / scale, lng / scale))
    return coords


__all__ = [
    "e5_col",
    "e5_sql",
    "zigzag_col",
    "zigzag_sql",
    "chunks_col",
    "chunks_sql",
    "decode_polyline",
    "N_CHUNKS",
]
