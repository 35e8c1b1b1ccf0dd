"""Geohash base-32 cell index — the third cell family next to the quadkey
ladder (functions/quadkey.py) and the flat-top hex grid (functions/hexgrid.py).

Four synchronized implementations of the SAME formula so every tier can be
cross-checked bit-for-bit:

- :func:`geohash_py`  — pure-Python golden (pins the public test vectors)
- :func:`geohash_np`  — numpy vectorized (inside Arrow UDF kernels)
- :func:`geohash_col` — native Spark Column expression (whole-stage codegen;
  the zero-Python production path)
- :func:`geohash_sql` — ANSI-SQL text (DuckDB oracle)

Geohash (public domain, G. Niemeyer 2008) interleaves longitude and latitude
range-bisection bits MSB-first starting with longitude, then emits 5-bit
groups through the base-32 alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``
(i, l, o left out). The bisection code is equivalently the fixed-point
integer

    x = floor((lon + 180) / 360 * 2^ceil(5p/2))   (clamped to the range)
    y = floor((lat +  90) / 180 * 2^floor(5p/2))

with the 5p-bit interleaved code Z placing x's bits at even positions and
y's at odd positions (MSB-first). All four tiers compute exactly that, so
the string is reproducible across Python, numpy, Spark codegen, and DuckDB.

The reference engine has no cell indexing at all (it is a per-file track
parser); like the quadkey and hex ladders this is north-rule spatial core
built fresh. Geohash complements the other two: it is the interchange format
most external geo datasets carry, and its prefix property gives a res-ladder
for free (a p-char prefix IS the parent cell), which the layout planner uses
the same way as quadkey prefixes.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_counts(precision: int) -> tuple[int, int]:
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash precision must be in [1, 12], got {precision}")
    total = 5 * precision
    lon_bits = (total + 1) // 2  # lon leads the interleave -> gets the extra bit
    return lon_bits, total - lon_bits


def geohash_py(lat: float, lon: float, precision: int = 6) -> str:
    lon_bits, lat_bits = _bit_counts(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * nx)), 0), nx - 1)
    y = min(max(int(math.floor((lat + 90.0) / 180.0 * ny)), 0), ny - 1)
    z = 0
    xi, yi = lon_bits, lat_bits
    for k in range(5 * precision):
        if k % 2 == 0:
            xi -= 1
            bit = (x >> xi) & 1
        else:
            yi -= 1
            bit = (y >> yi) & 1
        z = (z << 1) | bit
    return "".join(
        BASE32[(z >> (5 * (precision - 1 - j))) & 31] for j in range(precision)
    )


def geohash_np(lat: np.ndarray, lon: np.ndarray, precision: int = 6) -> np.ndarray:
    """Vectorized geohash; returns an object array of strings."""
    lon_bits, lat_bits = _bit_counts(precision)
    nx = np.int64(1) << lon_bits
    ny = np.int64(1) << lat_bits
    x = np.clip(np.floor((np.asarray(lon) + 180.0) / 360.0 * nx).astype(np.int64), 0, nx - 1)
    y = np.clip(np.floor((np.asarray(lat) + 90.0) / 180.0 * ny).astype(np.int64), 0, ny - 1)
    z = np.zeros_like(x)
    xi, yi = lon_bits, lat_bits
    for k in range(5 * precision):
        if k % 2 == 0:
            xi -= 1
            bit = (x >> xi) & 1
        else:
            yi -= 1
            bit = (y >> yi) & 1
        z = (z << 1) | bit
    lut = np.array(list(BASE32))
    chars = [
        lut[((z >> (5 * (precision - 1 - j))) & 31).astype(np.int64)]
        for j in range(precision)
    ]
    out = chars[0]
    for c in chars[1:]:
        out = np.char.add(out, c)
    return out.astype(object)


def geohash_int_col(lat: Column, lon: Column, precision: int = 6) -> Column:
    """The 5p-bit interleaved geohash code as a BIGINT Column (join key /
    layout form: cheaper to shuffle and sort than the string)."""
    lon_bits, lat_bits = _bit_counts(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    x = F.least(
        F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(nx))), F.lit(0)),
        F.lit(nx - 1),
    ).cast("long")
    y = F.least(
        F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(ny))), F.lit(0)),
        F.lit(ny - 1),
    ).cast("long")
    z = F.lit(0).cast("long")
    xi, yi = lon_bits, lat_bits
    for k in range(5 * precision):
        if k % 2 == 0:
            xi -= 1
            bit = F.shiftright(x, xi).bitwiseAND(F.lit(1))
        else:
            yi -= 1
            bit = F.shiftright(y, yi).bitwiseAND(F.lit(1))
        z = z * F.lit(2) + bit
    return z


def geohash_col(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Geohash string as a native Column expression (no Python)."""
    z = geohash_int_col(lat, lon, precision)
    chars = [
        F.substring(
            F.lit(BASE32),
            (F.shiftright(z, 5 * (precision - 1 - j)).bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"),
            1,
        )
        for j in range(precision)
    ]
    return F.concat(*chars)


def geohash_int_sql(lat: str, lon: str, precision: int = 6) -> tuple[str, str, str]:
    """DuckDB SQL pieces (x_expr, y_expr, z_expr) for the interleaved BIGINT
    code; ``z_expr`` references ``gx``/``gy`` which the caller binds in a CTE.
    Same bit weights as :func:`geohash_int_col` for identical ints."""
    lon_bits, lat_bits = _bit_counts(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    x = (
        f"LEAST(GREATEST(CAST(FLOOR(({lon} + 180.0) / 360.0 * {float(nx)}) AS BIGINT), 0), {nx - 1})"
    )
    y = (
        f"LEAST(GREATEST(CAST(FLOOR(({lat} + 90.0) / 180.0 * {float(ny)}) AS BIGINT), 0), {ny - 1})"
    )
    terms = []
    xi, yi = lon_bits, lat_bits
    for k in range(5 * precision):
        shift = 5 * precision - 1 - k
        if k % 2 == 0:
            xi -= 1
            bit = f"((gx >> {xi}) & 1)"
        else:
            yi -= 1
            bit = f"((gy >> {yi}) & 1)"
        terms.append(f"({bit} * {1 << shift})" if shift else bit)
    z = " + ".join(terms)
    return x, y, z


def geohash_sql(lat: str, lon: str, precision: int = 6) -> tuple[str, str, str, str]:
    """Returns (x_expr, y_expr, z_expr_over_gx_gy, string_expr_over_gz):
    the caller binds ``gx``/``gy`` in one CTE, ``gz`` in the next, then the
    string expression (so DuckDB doesn't re-expand the bit chain per char)."""
    x, y, z = geohash_int_sql(lat, lon, precision)
    chars = [
        f"SUBSTRING('{BASE32}', CAST(((gz >> {5 * (precision - 1 - j)}) & 31) + 1 AS INTEGER), 1)"
        for j in range(precision)
    ]
    s = " || ".join(chars)
    return x, y, z, s
