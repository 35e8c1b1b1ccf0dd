"""S2 cell ids — the fourth cell family next to the quadkey ladder
(functions/quadkey.py), the flat-top hex grid (functions/hexgrid.py) and
geohash (functions/geohash.py), and the second index named by the north
rule ("H3/S2-encoded").

S2 (public: the Apache-2.0 s2geometry library; Google, 2011) maps the
sphere onto the six faces of a circumscribed cube, warps each face with the
quadratic s-t projection so cells have near-uniform area, and orders the
2^level x 2^level face grid along a Hilbert curve.  A cell id is the 64-bit
``face(3 bits) | curve position (2*level bits) | 1 | 0...`` word; the
trailing set bit encodes the level, parents are bit-prefixes of children,
and curve locality makes range scans spatially coherent — which is exactly
why a 10^12-row corpus wants it as a layout/shuffle key.

Four synchronized implementations of the SAME arithmetic:

- :func:`s2_cellid_py`  — pure-Python golden (scalar glibc libm trig: the
  exact same library DuckDB links, see ``geo.haversine_m_exact``'s rule)
- :func:`s2_cellid_np`  — numpy-vectorized (Arrow kernels); ``trig="libm"``
  routes cos/sin through scalar libm for hash-gated paths, ``trig="np"``
  uses numpy SIMD trig (~1 ulp off libm on ~20% of inputs — production
  fast path where a 1-ulp boundary flip is acceptable)
- :func:`with_s2_cellid` — native Spark Column chain (whole-stage codegen,
  zero Python; JVM ``Math.cos`` may differ from libm by 1 ulp, so this tier
  is the production path, not the oracle path)
- :func:`s2_sql_ctes`   — ANSI-SQL CTE chain (DuckDB oracle), bit-identical
  to the py/np-libm tiers because cos/sin/sqrt/floor/divide all come from
  the same correctly-rounded (sqrt, /) or same-library (glibc trig) ops

Shared exactness discipline: radians are ``deg * (pi / 180.0)`` in every
tier (NOT ``java.lang.Math.toRadians``'s ``deg / 180.0 * pi`` — different
rounding); u/v are single IEEE divisions; the s-t warp is
``0.5*sqrt(1+3u)`` / ``1-0.5*sqrt(1-3u)`` with explicit multiply; the
Hilbert walk is pure integer arithmetic driven by one flattened 16-char
lookup string shared verbatim by all four tiers.

The per-level lookup tables are the published s2geometry constants
(s2coords.h: kIJtoPos / kPosToIJ / kPosToOrientation) — public-domain-style
constant tables cited the same way the FIT SDK base-type table is; all code
here is written fresh against the published algorithm description.  The
2-bit-per-level state walk is additionally cross-checked in tests against
an independently-coded variant of the C++ 4-bit lookup-table algorithm
(table built by recursion), plus curve-continuity and prefix invariants
that any wrong table entry would break.

The reference engine (a per-file track parser) has no cell indexing at
all; like the other three families this is north-rule spatial core built
fresh.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# -- published s2geometry lookup tables (s2coords.h) ------------------------
SWAP_MASK = 0x01
INVERT_MASK = 0x02
POS_TO_ORIENT = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)  # (1, 0, 0, 3)
POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
IJ_TO_POS = ((0, 1, 3, 2), (0, 3, 1, 2), (2, 3, 1, 0), (2, 1, 3, 0))

# flattened IJ_TO_POS, row per orientation: index = orient*4 + ij
IJ_TO_POS_LUT = "".join(str(p) for row in IJ_TO_POS for p in row)  # 0132031223102130
POS_TO_ORIENT_LUT = "".join(str(o) for o in POS_TO_ORIENT)  # 1003

MAX_LEVEL = 30
_D2R = math.pi / 180.0  # same double as SQL `pi() / 180.0`


def _check_level(level: int) -> None:
    if not 1 <= level <= MAX_LEVEL:
        raise ValueError(f"s2 level must be in [1, {MAX_LEVEL}], got {level}")


# ------------------------------------------------------------------ python
def s2_face_uv_py(lat: float, lon: float) -> tuple[int, float, float]:
    """(face, u, v) cube-face projection of a lat/lon degree pair.

    Face pick and per-face u/v formulas follow s2coords.h
    ``GetFace``/``ValidFaceXYZtoUV``; ties on |component| resolve exactly as
    the chained ``>`` comparisons below do in every tier.
    """
    phi = lat * _D2R
    lam = lon * _D2R
    cp = math.cos(phi)
    x = cp * math.cos(lam)
    y = cp * math.sin(lam)
    z = math.sin(phi)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        face = 0 if ax > az else 2
    else:
        face = 1 if ay > az else 2
    if (x, y, z)[face] < 0.0:
        face += 3
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z
    return face, u, v


def s2_uv_to_st_py(u: float) -> float:
    """Quadratic u->s warp (s2coords.h kQuadraticProjection UVtoST)."""
    if u >= 0.0:
        return 0.5 * math.sqrt(1.0 + 3.0 * u)
    return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)


def s2_st_to_ij_py(s: float, level: int) -> int:
    n = 1 << level
    return min(max(int(math.floor(s * n)), 0), n - 1)


def s2_cellid_from_face_ij_py(face: int, i: int, j: int, level: int) -> int:
    """Unsigned 64-bit S2 cell id from (face, i, j) at ``level`` — the
    2-bit-per-level Hilbert walk (initial orientation = face & SWAP_MASK)."""
    _check_level(level)
    pos = 0
    o = face & SWAP_MASK
    for k in range(level - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = IJ_TO_POS[o][ij]
        pos = (pos << 2) | p
        o ^= POS_TO_ORIENT[p]
    return ((face << (2 * level) | pos) << (61 - 2 * level)) | (1 << (60 - 2 * level))


def s2_cellid_to_face_ij_py(cellid: int, level: int) -> tuple[int, int, int]:
    """Inverse of :func:`s2_cellid_from_face_ij_py` (round-trip tests)."""
    _check_level(level)
    face = cellid >> 61
    pos = (cellid >> (61 - 2 * level)) & ((1 << (2 * level)) - 1)
    o, i, j = face & SWAP_MASK, 0, 0
    for k in range(level - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        ij = POS_TO_IJ[o][p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        o ^= POS_TO_ORIENT[p]
    return face, i, j


def s2_cellid_py(lat: float, lon: float, level: int) -> int:
    """Unsigned 64-bit S2 cell id of a lat/lon degree pair at ``level``."""
    face, u, v = s2_face_uv_py(lat, lon)
    i = s2_st_to_ij_py(s2_uv_to_st_py(u), level)
    j = s2_st_to_ij_py(s2_uv_to_st_py(v), level)
    return s2_cellid_from_face_ij_py(face, i, j, level)


def s2_signed(cellid: int) -> int:
    """Two's-complement BIGINT view (faces 4/5 set bit 63) — the join/layout
    form every engine's signed int64 carries."""
    return cellid - (1 << 64) if cellid >= (1 << 63) else cellid


def s2_token(cellid: int) -> str:
    """Canonical S2 token: 16-hex-digit id with trailing zeros stripped."""
    return format(cellid, "016x").rstrip("0") or "X"


def s2_parent(cellid: int, level: int, parent_level: int) -> int:
    """Parent id at ``parent_level`` (prefix property: zero the low position
    bits and set the new trailing marker)."""
    if not 0 <= parent_level <= level:
        raise ValueError("parent_level must be in [0, level]")
    lsb = 1 << (60 - 2 * parent_level)
    return (cellid & ~(2 * lsb - 1)) | lsb


# ------------------------------------------------------------------- numpy
_COS_LIBM = np.frompyfunc(math.cos, 1, 1)
_SIN_LIBM = np.frompyfunc(math.sin, 1, 1)


def _trig(arr: np.ndarray, trig: str) -> tuple[np.ndarray, np.ndarray]:
    if trig == "libm":
        return (
            _COS_LIBM(arr).astype(np.float64),
            _SIN_LIBM(arr).astype(np.float64),
        )
    return np.cos(arr), np.sin(arr)


def s2_cellid_np(
    lat: np.ndarray, lon: np.ndarray, level: int, trig: str = "libm"
) -> np.ndarray:
    """Vectorized cell ids as SIGNED int64 (two's-complement view of the
    unsigned id, matching :func:`s2_signed`).  ``trig="libm"`` is
    bit-identical to :func:`s2_cellid_py` / the SQL tier; ``trig="np"`` is
    the SIMD fast path (may differ at cell boundaries by 1 ulp of trig)."""
    _check_level(level)
    phi = np.asarray(lat, dtype=np.float64) * _D2R
    lam = np.asarray(lon, dtype=np.float64) * _D2R
    cp, z = _trig(phi, trig)
    cl, sl = _trig(lam, trig)
    x = cp * cl
    y = cp * sl
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        ax > ay,
        np.where(ax > az, 0, 2),
        np.where(ay > az, 1, 2),
    ).astype(np.int64)
    comp = np.choose(face, (x, y, z))
    face = np.where(comp < 0.0, face + 3, face)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            -y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            -x / z,
        )

    def st(w: np.ndarray) -> np.ndarray:
        with np.errstate(invalid="ignore"):  # unused where-branch sqrt(<0)
            return np.where(
                w >= 0.0,
                0.5 * np.sqrt(1.0 + 3.0 * w),
                1.0 - 0.5 * np.sqrt(1.0 - 3.0 * w),
            )

    n = np.int64(1 << level)
    i = np.clip(np.floor(st(u) * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    j = np.clip(np.floor(st(v) * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    ij2pos = np.array([list(r) for r in IJ_TO_POS], dtype=np.uint64)  # [o][ij]
    pos2or = np.array(POS_TO_ORIENT, dtype=np.uint64)
    pos = np.zeros_like(i)
    o = face.astype(np.uint64) & np.uint64(SWAP_MASK)
    for k in range(level - 1, -1, -1):
        ij = (((i >> np.uint64(k)) & np.uint64(1)) << np.uint64(1)) | (
            (j >> np.uint64(k)) & np.uint64(1)
        )
        p = ij2pos[o, ij]
        pos = (pos << np.uint64(2)) | p
        o = o ^ pos2or[p]
    full = (
        ((face.astype(np.uint64) << np.uint64(2 * level)) | pos)
        << np.uint64(61 - 2 * level)
    ) | np.uint64(1 << (60 - 2 * level))
    return full.view(np.int64)


# ------------------------------------------------------------------ Column
def _lut_col(lut: str, idx: Column) -> Column:
    return F.substring(F.lit(lut), (idx + F.lit(1)).cast("int"), 1).cast("long")


def with_s2_cellid(
    df: DataFrame, lat: str, lon: str, level: int, out: str = "s2_id"
) -> DataFrame:
    """Production Column path: appends ``out`` (signed int64 cell id) with a
    chain of narrow projections — zero Python, whole-stage codegen.

    The Hilbert orientation is sequential state, so each level is its own
    ``withColumn`` step (Catalyst keeps multiply-referenced non-trivial
    aliases un-inlined; the chain compiles to one codegen stage).  Trig is
    JVM ``Math.cos``/``sin`` — may differ from the libm tiers by 1 ulp at
    cell boundaries, which is why hash-gated oracles use the kernel tier
    (:func:`s2_cellid_np` with ``trig="libm"``) and this path is pytest-
    pinned against it instead.
    """
    _check_level(level)
    t = "__s2_"
    d2r = F.lit(_D2R)
    phi = F.col(lat) * d2r
    lam = F.col(lon) * d2r
    df = df.withColumns(
        {
            t + "x": F.cos(phi) * F.cos(lam),
            t + "y": F.cos(phi) * F.sin(lam),
            t + "z": F.sin(phi),
        }
    )
    x, y, z = F.col(t + "x"), F.col(t + "y"), F.col(t + "z")
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    axis = F.when(ax > ay, F.when(ax > az, F.lit(0)).otherwise(F.lit(2))).otherwise(
        F.when(ay > az, F.lit(1)).otherwise(F.lit(2))
    )
    df = df.withColumn(t + "axis", axis)
    axis = F.col(t + "axis")
    comp = (
        F.when(axis == 0, x).when(axis == 1, y).otherwise(z)
    )
    df = df.withColumn(
        t + "face", F.when(comp < 0.0, axis + F.lit(3)).otherwise(axis).cast("long")
    )
    face = F.col(t + "face")
    u = (
        F.when(face == 0, y / x)
        .when(face == 1, -x / y)
        .when(face == 2, -x / z)
        .when(face == 3, z / x)
        .when(face == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(face == 0, z / x)
        .when(face == 1, z / y)
        .when(face == 2, -y / z)
        .when(face == 3, y / x)
        .when(face == 4, -x / y)
        .otherwise(-x / z)
    )
    df = df.withColumns({t + "u": u, t + "v": v})

    def st(w: Column) -> Column:
        return F.when(
            w >= 0.0, F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * w)
        ).otherwise(F.lit(1.0) - F.lit(0.5) * F.sqrt(F.lit(1.0) - F.lit(3.0) * w))

    n = 1 << level
    df = df.withColumns(
        {
            t
            + "i": F.least(
                F.greatest(
                    F.floor(st(F.col(t + "u")) * F.lit(float(n))).cast("long"),
                    F.lit(0).cast("long"),
                ),
                F.lit(n - 1).cast("long"),
            ),
            t
            + "j": F.least(
                F.greatest(
                    F.floor(st(F.col(t + "v")) * F.lit(float(n))).cast("long"),
                    F.lit(0).cast("long"),
                ),
                F.lit(n - 1).cast("long"),
            ),
        }
    )
    df = df.withColumns(
        {
            t + "pos": F.lit(0).cast("long"),
            t + "o": F.col(t + "face").bitwiseAND(F.lit(SWAP_MASK)),
        }
    )
    i, j = F.col(t + "i"), F.col(t + "j")
    for k in range(level - 1, -1, -1):
        ij = F.shiftright(i, k).bitwiseAND(F.lit(1)) * F.lit(2) + F.shiftright(
            j, k
        ).bitwiseAND(F.lit(1))
        df = df.withColumn(
            t + "p", _lut_col(IJ_TO_POS_LUT, F.col(t + "o") * F.lit(4) + ij)
        )
        df = df.withColumns(
            {
                t + "pos": F.col(t + "pos") * F.lit(4) + F.col(t + "p"),
                t + "o": F.col(t + "o").bitwiseXOR(
                    _lut_col(POS_TO_ORIENT_LUT, F.col(t + "p"))
                ),
            }
        )
    # Java long shifts/mults wrap two's-complement, matching s2_signed.
    full = (
        F.shiftleft(
            F.shiftleft(F.col(t + "face"), 2 * level) + F.col(t + "pos"),
            61 - 2 * level,
        )
        + F.lit(1 << (60 - 2 * level)).cast("long")
    )
    df = df.withColumn(out, full)
    return df.drop(*[c for c in df.columns if c.startswith(t)])


def s2_token_col(s2_id: Column) -> Column:
    """Canonical token from the signed int64 id (hex of the raw 64 bits,
    trailing zeros stripped; ids are never 0 so the result is non-empty)."""
    return F.regexp_replace(
        F.lower(F.lpad(F.hex(s2_id), 16, "0")), "0+$", ""
    )


# --------------------------------------------------------------------- SQL
def s2_sql_ctes(
    lat: str, lon: str, level: int, keys: str, source: str, prefix: str = "s2"
) -> tuple[str, str]:
    """DuckDB CTE chain computing the signed int64 cell id, bit-identical to
    the py/np-libm tiers.

    Returns ``(cte_sql, final_name)``: ``cte_sql`` is a fragment suitable
    for splicing after ``WITH`` (series of named CTEs, no trailing comma);
    the final CTE ``final_name`` exposes ``keys`` plus ``s2_id BIGINT``.

    ``keys`` is the comma-separated pass-through column list; ``source`` the
    input relation exposing them plus ``lat``/``lon`` expressions' inputs.
    Key names must not collide with the chain's internal columns.
    """
    _check_level(level)
    reserved = {"x", "y", "z", "axis", "face", "u", "v", "i", "j", "pos", "o", "p", "h", "s2_id"}
    clash = [k for k in (c.strip() for c in keys.split(",")) if k in reserved]
    if clash:
        raise ValueError(
            f"s2_sql_ctes key column(s) {clash} collide with internal names; "
            f"alias them in the source CTE first (reserved: {sorted(reserved)})"
        )
    p = prefix
    n = 1 << level
    ctes: list[str] = []
    ctes.append(
        f"{p}_xyz AS (SELECT {keys}, "
        f"cos(({lat}) * (pi() / 180.0)) * cos(({lon}) * (pi() / 180.0)) AS x, "
        f"cos(({lat}) * (pi() / 180.0)) * sin(({lon}) * (pi() / 180.0)) AS y, "
        f"sin(({lat}) * (pi() / 180.0)) AS z FROM {source})"
    )
    ctes.append(
        f"{p}_axis AS (SELECT {keys}, x, y, z, "
        "CASE WHEN abs(x) > abs(y) THEN (CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END) "
        "ELSE (CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END) END AS axis "
        f"FROM {p}_xyz)"
    )
    ctes.append(
        f"{p}_face AS (SELECT {keys}, x, y, z, "
        "CAST(CASE WHEN (CASE WHEN axis = 0 THEN x WHEN axis = 1 THEN y ELSE z END) < 0.0 "
        f"THEN axis + 3 ELSE axis END AS BIGINT) AS face FROM {p}_axis)"
    )
    ctes.append(
        f"{p}_uv AS (SELECT {keys}, face, "
        "CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z "
        "WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u, "
        "CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z "
        "WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v "
        f"FROM {p}_face)"
    )

    def st(w: str) -> str:
        return (
            f"CASE WHEN {w} >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * {w}) "
            f"ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {w}) END"
        )

    ctes.append(
        f"{p}_ij AS (SELECT {keys}, face, "
        f"LEAST(GREATEST(CAST(FLOOR(({st('u')}) * {float(n)}) AS BIGINT), 0), {n - 1}) AS i, "
        f"LEAST(GREATEST(CAST(FLOOR(({st('v')}) * {float(n)}) AS BIGINT), 0), {n - 1}) AS j "
        f"FROM {p}_uv)"
    )
    prev = f"{p}_ij"
    state = f"{p}_w0"
    ctes.append(
        f"{state} AS (SELECT {keys}, face, i, j, CAST(0 AS BIGINT) AS pos, "
        f"face & {SWAP_MASK} AS o FROM {prev})"
    )
    for step, k in enumerate(range(level - 1, -1, -1), start=1):
        nxt = f"{p}_w{step}"
        pexpr = (
            f"CAST(SUBSTRING('{IJ_TO_POS_LUT}', "
            f"CAST(o * 4 + ((i >> {k}) & 1) * 2 + ((j >> {k}) & 1) + 1 AS INTEGER), 1) AS BIGINT)"
        )
        ctes.append(
            f"{nxt} AS (SELECT {keys}, face, i, j, pos * 4 + p AS pos, "
            f"xor(o, CAST(SUBSTRING('{POS_TO_ORIENT_LUT}', CAST(p + 1 AS INTEGER), 1) AS BIGINT)) AS o "
            f"FROM (SELECT {keys}, face, i, j, pos, o, {pexpr} AS p FROM {state}) t)"
        )
        state = nxt
    final = f"{p}_id"
    # assemble in HUGEINT, then wrap to the signed BIGINT two's-complement view
    ctes.append(
        f"{final} AS (SELECT {keys}, "
        f"CAST(CASE WHEN h >= 9223372036854775808::HUGEINT "
        f"THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS s2_id "
        f"FROM (SELECT {keys}, "
        f"CAST(face * {1 << (2 * level)} + pos AS HUGEINT) * {1 << (61 - 2 * level)}::HUGEINT "
        f"+ {1 << (60 - 2 * level)}::HUGEINT AS h FROM {state}) t)"
    )
    return ",\n    ".join(ctes), final


def s2_token_sql(s2_id: str) -> str:
    """SQL twin of :func:`s2_token_col` over a signed BIGINT id column."""
    unsigned = (
        f"CAST(CASE WHEN {s2_id} < 0 "
        f"THEN CAST({s2_id} AS HUGEINT) + 18446744073709551616::HUGEINT "
        f"ELSE CAST({s2_id} AS HUGEINT) END AS UBIGINT)"
    )
    return f"regexp_replace(lower(lpad(hex({unsigned}), 16, '0')), '0+$', '')"
