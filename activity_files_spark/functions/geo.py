"""Geodesic + FIT scalar kernels as native Column expressions (JVM-side,
whole-stage-codegen) with pure-Python twins for fixtures/goldens.

Semantics pinned to the reference:
- haversine: spherical earth R=6,371,000 m, atan2 form
  (reference: lib/src/geo_math.dart:8-22)
- FIT semicircles -> degrees: v*180/2^31, reject |deg|>180
  (reference: lib/src/parse/fit_parser.dart:1232-1248)
- FIT altitude: raw/5 - 500, invalid 0xFFFF (fit_parser.dart:1334-1343)
- FIT epoch: 1989-12-31T00:00:00Z == unix 631065600 (fit_parser.dart:1213-1230)
- pace: 1000/speed s/km when speed>0 (lib/src/channel_mapper.dart:147-153)
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_000.0
FIT_EPOCH_UNIX = 631_065_600  # 1989-12-31T00:00:00Z
FIT_TS_MAX = 1_924_992_000  # plausibility clamp upper bound (fit_parser.dart:1226)
SEMICIRCLE_DEG = 180.0 / 2_147_483_648.0  # 180 / 2^31


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters — pure Column expression (no UDF).

    Exact composition of the reference's atan2 form (geo_math.dart:8-22):
    a = sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2); d = 2R·atan2(√a, √(1−a)).
    """
    d2r = F.lit(math.pi) / F.lit(180.0)
    phi1 = lat1 * d2r
    phi2 = lat2 * d2r
    dphi = (lat2 - lat1) * d2r
    dlmb = (lon2 - lon1) * d2r
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(phi1) * F.cos(phi2) * F.sin(dlmb / 2) * F.sin(dlmb / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.atan2(F.sqrt(a), F.sqrt(F.lit(1.0) - a))


def haversine_m_py(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Pure-Python twin of :func:`haversine_m` for goldens."""
    d2r = math.pi / 180.0
    phi1, phi2 = lat1 * d2r, lat2 * d2r
    dphi = (lat2 - lat1) * d2r
    dlmb = (lon2 - lon1) * d2r
    a = math.sin(dphi / 2) ** 2 + math.cos(phi1) * math.cos(phi2) * math.sin(dlmb / 2) ** 2
    return 2.0 * EARTH_RADIUS_M * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))


def haversine_m_exact(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Scalar libm twin with the EXACT op order of :func:`haversine_sql` —
    explicit ``x*x`` (never ``**``/``pow``) and the same left-associated
    product ``((cos*cos)*sl)*sl``. CPython's ``math`` module calls the same
    glibc libm DuckDB links, so this is bit-identical to the SQL twin
    (verified on 20k random pairs, 0 mismatches); numpy's SIMD trig is NOT
    (~1 ulp off on ~20% of inputs), so Arrow kernels that feed hash-gated
    oracles must use this scalar form, not a vectorized rewrite."""
    d2r = math.pi / 180.0
    sp = math.sin((lat2 - lat1) * d2r / 2)
    sl = math.sin((lon2 - lon1) * d2r / 2)
    a = sp * sp + math.cos(lat1 * d2r) * math.cos(lat2 * d2r) * sl * sl
    return 2.0 * EARTH_RADIUS_M * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """ANSI-SQL text twin (for DuckDB oracles) of :func:`haversine_m`.

    Uses explicit multiplication (never ``pow``) so the float ops are the
    exact same IEEE sequence as the Column/Python versions.
    """
    d2r = "(pi() / 180.0)"
    sp = f"sin((({lat2})-({lat1})) * {d2r} / 2)"
    sl = f"sin((({lon2})-({lon1})) * {d2r} / 2)"
    a = f"({sp}*{sp} + cos(({lat1}) * {d2r})*cos(({lat2}) * {d2r})*{sl}*{sl})"
    return f"2.0 * {EARTH_RADIUS_M} * atan2(sqrt({a}), sqrt(1.0 - {a}))"


def fit_semicircles_to_deg(raw: Column) -> Column:
    """FIT semicircle int32 -> degrees; invalid sentinels + out-of-range -> null."""
    deg = raw.cast("double") * F.lit(SEMICIRCLE_DEG)
    return (
        F.when(raw.isNull(), None)
        .when(raw == 0x7FFFFFFF, None)
        .when(raw == -0x80000000, None)
        .when(F.abs(deg) > 180.0, None)
        .otherwise(deg)
    )


def fit_altitude_m(raw: Column) -> Column:
    """FIT uint16 altitude -> meters: raw/5 - 500; 0xFFFF invalid."""
    return F.when(raw.isNull() | (raw == 0xFFFF), None).otherwise(
        raw.cast("double") / 5.0 - 500.0
    )


def fit_timestamp(raw: Column) -> Column:
    """FIT uint32 seconds since 1989-12-31Z -> TIMESTAMP; 0/0xFFFFFFFF invalid,
    plausibility window [1, 1924992000] on the FIT-epoch value."""
    ok = raw.isNotNull() & (raw >= 1) & (raw <= FIT_TS_MAX) & (raw != 0xFFFFFFFF)
    return F.when(ok, F.timestamp_seconds(raw.cast("long") + FIT_EPOCH_UNIX))


def pace_s_per_km(speed_mps: Column) -> Column:
    """Pace in s/km from speed m/s; null when speed <= 0."""
    return F.when(speed_mps > 0, F.lit(1000.0) / speed_mps)


def lerp(x0: Column, x1: Column, y0: Column, y1: Column, x: Column) -> Column:
    """Linear interpolation y(x) between (x0,y0)-(x1,y1); y0 when x1==x0.

    Mirrors transform_utils.dart:140-199 (time-factor lerp).
    """
    return F.when(x1 == x0, y0).otherwise(
        y0 + (y1 - y0) * ((x - x0) / (x1 - x0))
    )


def bearing_deg(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing in degrees, normalized to [0, 360).

    Standard formula: atan2(sin Δλ·cos φ2, cos φ1·sin φ2 − sin φ1·cos φ2·cos Δλ).
    Pure Column expression; :func:`bearing_sql` is the bit-identical DuckDB
    twin (same op order, no radians()/pow()). Not in the reference (it never
    derives heading); used by the turn-angle analytics extension.
    """
    d2r = F.lit(math.pi) / F.lit(180.0)
    phi1 = lat1 * d2r
    phi2 = lat2 * d2r
    dlmb = (lon2 - lon1) * d2r
    y = F.sin(dlmb) * F.cos(phi2)
    x = F.cos(phi1) * F.sin(phi2) - F.sin(phi1) * F.cos(phi2) * F.cos(dlmb)
    deg = F.atan2(y, x) * (F.lit(180.0) / F.lit(math.pi))
    return F.when(deg < 0, deg + F.lit(360.0)).otherwise(deg)


def bearing_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """ANSI-SQL twin of :func:`bearing_deg` (same IEEE sequence)."""
    d2r = "(pi() / 180.0)"
    y = f"sin((({lon2})-({lon1})) * {d2r}) * cos(({lat2}) * {d2r})"
    x = (
        f"cos(({lat1}) * {d2r}) * sin(({lat2}) * {d2r}) "
        f"- sin(({lat1}) * {d2r}) * cos(({lat2}) * {d2r}) * cos((({lon2})-({lon1})) * {d2r})"
    )
    deg = f"atan2({y}, {x}) * (180.0 / pi())"
    return f"CASE WHEN {deg} < 0 THEN {deg} + 360.0 ELSE {deg} END"


def project_cols(
    lat: Column, lon: Column, bearing: Column, dist_m: Column
) -> tuple[Column, Column]:
    """ST_Project: spherical destination point ``dist_m`` meters along
    initial ``bearing`` (degrees) — the forward geodesic, the inverse
    companion of :func:`bearing_deg`. Returns (lat2, lon2) in degrees.

    φ2 = asin(sin φ1 cos δ + cos φ1 sin δ cos θ), δ = d/R;
    λ2 = λ1 + atan2(sin θ sin δ cos φ1, cos δ − sin φ1 sin φ2), with
    sin φ2 reused literally so both engines evaluate the SAME IEEE tree
    (:func:`project_sql` is the twin; no radians(), no pow()). λ2 is NOT
    wrapped to [−180, 180] — the caller wraps if the use case can cross
    the antimeridian (a branch here would double the twin surface).
    """
    d2r = F.lit(math.pi) / F.lit(180.0)
    phi1 = lat * d2r
    theta = bearing * d2r
    delta = dist_m / F.lit(EARTH_RADIUS_M)
    sinphi2 = F.sin(phi1) * F.cos(delta) + F.cos(phi1) * F.sin(delta) * F.cos(theta)
    # asin via atan2+sqrt: DuckDB's asin drifts 1 ulp from libm on ~12% of
    # inputs (measured), while atan2/sqrt are bit-stable across engines —
    # the same reason haversine uses atan2 instead of asin
    lat2 = F.atan2(sinphi2, F.sqrt(F.lit(1.0) - sinphi2 * sinphi2)) * (
        F.lit(180.0) / F.lit(math.pi)
    )
    lon2 = lon + F.atan2(
        F.sin(theta) * F.sin(delta) * F.cos(phi1),
        F.cos(delta) - F.sin(phi1) * sinphi2,
    ) * (F.lit(180.0) / F.lit(math.pi))
    return lat2, lon2


def project_sql(lat: str, lon: str, bearing: str, dist_m: str) -> tuple[str, str]:
    """ANSI-SQL twin of :func:`project_cols` (same IEEE sequence)."""
    d2r = "(pi() / 180.0)"
    phi1 = f"(({lat}) * {d2r})"
    theta = f"(({bearing}) * {d2r})"
    delta = f"(({dist_m}) / {EARTH_RADIUS_M})"
    sinphi2 = (
        f"(sin({phi1}) * cos({delta}) + cos({phi1}) * sin({delta}) * cos({theta}))"
    )
    lat2 = f"(atan2({sinphi2}, sqrt(1.0 - {sinphi2} * {sinphi2})) * (180.0 / pi()))"
    lon2 = (
        f"(({lon}) + atan2(sin({theta}) * sin({delta}) * cos({phi1}), "
        f"cos({delta}) - sin({phi1}) * {sinphi2}) * (180.0 / pi()))"
    )
    return lat2, lon2


def project_py(lat: float, lon: float, bearing: float, dist_m: float) -> tuple[float, float]:
    """Scalar twin of :func:`project_cols`."""
    d2r = math.pi / 180.0
    phi1 = lat * d2r
    theta = bearing * d2r
    delta = dist_m / EARTH_RADIUS_M
    sinphi2 = (
        math.sin(phi1) * math.cos(delta)
        + math.cos(phi1) * math.sin(delta) * math.cos(theta)
    )
    lat2 = math.atan2(sinphi2, math.sqrt(1.0 - sinphi2 * sinphi2)) * (180.0 / math.pi)
    lon2 = lon + math.atan2(
        math.sin(theta) * math.sin(delta) * math.cos(phi1),
        math.cos(delta) - math.sin(phi1) * sinphi2,
    ) * (180.0 / math.pi)
    return lat2, lon2


def turn_angle_deg(b1: Column, b2: Column) -> Column:
    """Absolute turn angle in [0, 180] between two bearings in degrees."""
    d = F.abs(b2 - b1)
    return F.least(d, F.lit(360.0) - d)


def turn_angle_sql(b1: str, b2: str) -> str:
    return f"LEAST(ABS(({b2}) - ({b1})), 360.0 - ABS(({b2}) - ({b1})))"
