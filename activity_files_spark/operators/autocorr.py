"""Global spatial autocorrelation (Moran's I) over a cell raster — the
"is this hot-spot map clustered or noise" statistic every geospatial
warehouse ships (PostGIS/GeoDa/esda `Moran`), here as one relational
pass over the observed cells.

Definition (queen contiguity over OBSERVED cells, the esda default when
fed a lattice): with x_i the per-cell count, mu = S/N, w_ij = 1 iff cells
i != j are 8-adjacent AND both observed,

    I = (N / W) * sum_ij w_ij (x_i-mu)(x_j-mu) / sum_i (x_i-mu)^2

Exactness design: expanding the centered products gives

    I = (N^2 P - 2 N S T + W S^2) / (W * (N SS - S^2))

with ONLY integer terms: N cells, W ordered adjacent pairs,
S = sum x, SS = sum x^2, P = sum_ij w_ij x_i x_j, T = sum_i deg_i x_i.
Both engines aggregate exact BIGINTs and perform ONE final int->double
division — no order-dependent float sums anywhere, so the statistic
hash-gates bit-for-bit.  (BIGINT bounds: N^2 P is the largest term;
at 2^63 that allows ~10^4 cells with ~10^3 counts — the per-rollup tier
this query runs on.  A 10^12-point corpus first rolls up to the same
bounded cell raster, or swaps the arithmetic to DECIMAL(38,0), which
both engines support with identical integer semantics.)

Scale shape: one groupBy(cell) rollup (map-side combined), one 8-way
offset explode, one self-equi-join on cell id, and ONE aggregation over a
tagged union for the scalar terms — no cartesian, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]


def _conj(preds):
    out = F.lit(True)
    for p in preds:
        out = out & p
    return out


def morans_i(cells: DataFrame) -> DataFrame:
    """One-row Moran's I over ``cells`` = (cx, cy, x) with BIGINT count x.

    Returns (n_cells, w_pairs, num, den, morans_i): exact integer
    numerator/denominator of the expanded formula plus their quotient.
    """
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _OFFSETS
        ]
    )
    probes = cells.select(
        "cx", "cy", F.col("x").alias("xi"), F.explode(offs).alias("o")
    ).select(
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
        "xi",
    )
    adj = probes.join(
        cells.select("cx", "cy", F.col("x").alias("xj")), ["cx", "cy"]
    )
    # ONE aggregation over a tagged union — joining two single-row
    # aggregates instead constant-folds the literal key and plans a
    # BroadcastNestedLoopJoin, tripping the plan-lint gate
    tagged = cells.select(
        F.lit(0).alias("kind"),
        F.col("x").alias("xi"),
        F.lit(None).cast("long").alias("xj"),
    ).unionByName(
        adj.select(F.lit(1).alias("kind"), "xi", "xj")
    )
    is_cell = F.col("kind") == 0
    is_pair = F.col("kind") == 1
    j = tagged.agg(
        F.count(F.when(is_cell, 1)).alias("n_cells"),
        F.sum(F.when(is_cell, F.col("xi"))).alias("s_sum"),
        F.sum(F.when(is_cell, F.col("xi") * F.col("xi"))).alias("ss_sum"),
        F.count(F.when(is_pair, 1)).alias("w_pairs"),
        F.sum(F.when(is_pair, F.col("xi") * F.col("xj"))).alias("p_sum"),
        F.sum(F.when(is_pair, F.col("xi"))).alias("t_sum"),
    )
    num = (
        F.col("n_cells") * F.col("n_cells") * F.col("p_sum")
        - F.lit(2) * F.col("n_cells") * F.col("s_sum") * F.col("t_sum")
        + F.col("w_pairs") * F.col("s_sum") * F.col("s_sum")
    )
    den = F.col("w_pairs") * (
        F.col("n_cells") * F.col("ss_sum") - F.col("s_sum") * F.col("s_sum")
    )
    return j.select(
        "n_cells",
        "w_pairs",
        num.alias("num"),
        den.alias("den"),
        (num.cast("double") / den.cast("double")).alias("morans_i"),
    )


def getis_ord_gi_star(cells: DataFrame, by: tuple[str, ...] = ()) -> DataFrame:
    """Getis-Ord Gi* hot-spot z-scores — the LOCAL companion of
    :func:`morans_i` (ArcGIS "Hot Spot Analysis", esda ``G_Local``
    with star=True): per cell, how extreme is the neighborhood sum
    (queen + self) against the global mean.

    Same exactness discipline: with integer G_i = neighborhood sum,
    W_i = neighborhood size, N cells, S = sum x, SS = sum x^2,

        z_i = (N*G_i - S*W_i) / sqrt((N*SS - S^2) * (N*W_i - W_i^2) / (N-1))

    — every term under the sqrt is an exact BIGINT, the float tail is the
    same fixed expression tree in both engines, so the z-scores are
    bit-identical.  Globals attach via an unpartitioned window (ONE
    single-partition exchange over the post-rollup raster — bounded
    cardinality by construction — not a literal-key join, which plans a
    nested loop).

    ``by`` names optional partition columns (e.g. a time bucket): the
    neighborhood join and the global terms are then computed WITHIN each
    partition — the per-slice Gi* that emerging-hot-spot analysis stacks.
    With a real ``by`` the globals window partitions on it (no
    single-partition exchange at all).

    Returns (*by, cx, cy, x, g_i, w_i, num, z) per observed cell.
    """
    by = list(by)
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _OFFSETS + [(0, 0)]
        ]
    )
    probes = cells.select(
        *by, "cx", "cy", F.col("x").alias("xi"), F.explode(offs).alias("o")
    ).select(
        *by,
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
        "xi",
    )
    hood = (
        probes.join(
            cells.select(
                *[F.col(c).alias(f"i_{c}") for c in by],
                F.col("cx").alias("icx"),
                F.col("cy").alias("icy"),
                F.col("x").alias("_x"),
            ),
            # probe row (cx,cy) targets neighbor j; flip the join so each
            # OBSERVED cell i collects the xi of every probe that lands on
            # it — i.e. sums its own neighborhood (within its partition)
            _conj(
                [F.col("cx") == F.col("icx"), F.col("cy") == F.col("icy")]
                + [F.col(c) == F.col(f"i_{c}") for c in by]
            ),
        )
        .groupBy(*[f"i_{c}" for c in by], "icx", "icy", "_x")
        .agg(F.sum("xi").alias("g_i"), F.count("*").alias("w_i"))
        .select(
            *[F.col(f"i_{c}").alias(c) for c in by],
            F.col("icx").alias("cx"),
            F.col("icy").alias("cy"),
            F.col("_x").alias("x"),
            "g_i",
            "w_i",
        )
    )
    wall = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n = F.count("*").over(wall)
    s = F.sum("x").over(wall)
    ss = F.sum(F.col("x") * F.col("x")).over(wall)
    num = n * F.col("g_i") - s * F.col("w_i")
    a = n * ss - s * s
    b = n * F.col("w_i") - F.col("w_i") * F.col("w_i")
    z = num.cast("double") / F.sqrt(
        a.cast("double") * b.cast("double") / (n - F.lit(1)).cast("double")
    )
    return hood.select(
        *by, "cx", "cy", "x", "g_i", "w_i", num.alias("num"), z.alias("z")
    )


def getis_ord_gi_star_py(cells: dict[tuple[int, int], int]) -> dict:
    """Pure-python twin (tests): {(cx, cy): (x, g_i, w_i, num, z)}."""
    n = len(cells)
    s = sum(cells.values())
    ss = sum(v * v for v in cells.values())
    a = n * ss - s * s
    out = {}
    for (cx, cy), x in cells.items():
        g = w = 0
        for dx, dy in _OFFSETS + [(0, 0)]:
            xj = cells.get((cx + dx, cy + dy))
            if xj is not None:
                g += xj
                w += 1
        num = n * g - s * w
        b = n * w - w * w
        z = float(num) / math.sqrt(float(a) * float(b) / float(n - 1))
        out[(cx, cy)] = (x, g, w, num, z)
    return out


def getis_ord_gi_star_sql(cells_cte: str, by: tuple[str, ...] = ()) -> str:
    """DuckDB twin over ``cells_cte`` exposing (*by, cx, cy, x)."""
    offs = ", ".join(
        f"({dx}, {dy})" for dx, dy in _OFFSETS + [(0, 0)]
    )
    bysel = "".join(f"c.{c}, " for c in by)
    byeq = "".join(f" AND p.{c} = c.{c}" for c in by)
    bycols = "".join(f"{c}, " for c in by)
    bygrp = ", ".join(str(i + 1) for i in range(len(by) + 3))
    bypart = ("PARTITION BY " + ", ".join(by)) if by else ""
    return f"""gioff AS (
      SELECT * FROM (VALUES {offs}) AS o(dx, dy)
    ), giprobe AS (
      SELECT {bysel}c.cx + o.dx AS cx, c.cy + o.dy AS cy, c.x AS xi
      FROM {cells_cte} c, gioff o
    ), gihood AS (
      SELECT {bysel}c.cx, c.cy, c.x, SUM(p.xi) AS g_i, COUNT(*) AS w_i
      FROM giprobe p JOIN {cells_cte} c
        ON p.cx = c.cx AND p.cy = c.cy{byeq}
      GROUP BY {bygrp}
    ), gistar AS (
      SELECT {bycols}cx, cy, x, g_i, w_i,
             nn * g_i - s * w_i AS num,
             CAST(nn * g_i - s * w_i AS DOUBLE)
               / sqrt(CAST(nn*ss - s*s AS DOUBLE)
                      * CAST(nn*w_i - w_i*w_i AS DOUBLE)
                      / CAST(nn - 1 AS DOUBLE)) AS z
      FROM (
        SELECT {bycols}cx, cy, x, g_i, w_i,
               COUNT(*) OVER ({bypart}) AS nn,
               SUM(x) OVER ({bypart}) AS s,
               SUM(x * x) OVER ({bypart}) AS ss
        FROM gihood
      ) t
    )"""


def morans_i_py(cells: dict[tuple[int, int], int]) -> dict:
    """Pure-python twin (tests): same integer expansion."""
    n = len(cells)
    s = sum(cells.values())
    ss = sum(v * v for v in cells.values())
    w = p = t = 0
    for (cx, cy), xi in cells.items():
        for dx, dy in _OFFSETS:
            xj = cells.get((cx + dx, cy + dy))
            if xj is not None:
                w += 1
                p += xi * xj
                t += xi
    num = n * n * p - 2 * n * s * t + w * s * s
    den = w * (n * ss - s * s)
    return {
        "n_cells": n,
        "w_pairs": w,
        "num": num,
        "den": den,
        "morans_i": num / den if den else None,
    }


def morans_i_definitional_py(cells: dict[tuple[int, int], int]) -> float:
    """Textbook float definition (tests only): centered double sums."""
    n = len(cells)
    mu = sum(cells.values()) / n
    w = 0
    cross = 0.0
    for (cx, cy), xi in cells.items():
        for dx, dy in _OFFSETS:
            xj = cells.get((cx + dx, cy + dy))
            if xj is not None:
                w += 1
                cross += (xi - mu) * (xj - mu)
    d = sum((v - mu) ** 2 for v in cells.values())
    return (n / w) * cross / d


def morans_i_sql(cells_cte: str) -> str:
    """DuckDB twin over ``cells_cte`` exposing (cx, cy, x)."""
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFSETS)
    return f"""maoff AS (
      SELECT * FROM (VALUES {offs}) AS o(dx, dy)
    ), maprobe AS (
      SELECT c.cx + o.dx AS cx, c.cy + o.dy AS cy, c.x AS xi
      FROM {cells_cte} c, maoff o
    ), maadj AS (
      SELECT p.xi, c.x AS xj
      FROM maprobe p JOIN {cells_cte} c ON p.cx = c.cx AND p.cy = c.cy
    ), mapair AS (
      SELECT COUNT(*) AS w_pairs, SUM(xi * xj) AS p_sum, SUM(xi) AS t_sum
      FROM maadj
    ), mabase AS (
      SELECT COUNT(*) AS n_cells, SUM(x) AS s_sum, SUM(x * x) AS ss_sum
      FROM {cells_cte}
    ), morans AS (
      SELECT n_cells, w_pairs,
             n_cells*n_cells*p_sum - 2*n_cells*s_sum*t_sum
               + w_pairs*s_sum*s_sum AS num,
             w_pairs * (n_cells*ss_sum - s_sum*s_sum) AS den,
             CAST(n_cells*n_cells*p_sum - 2*n_cells*s_sum*t_sum
               + w_pairs*s_sum*s_sum AS DOUBLE)
               / CAST(w_pairs * (n_cells*ss_sum - s_sum*s_sum) AS DOUBLE)
               AS morans_i
      FROM mabase, mapair
    )"""


def mann_kendall_trend(scored: DataFrame, by: tuple[str, ...], t: str, v: str) -> DataFrame:
    """Mann-Kendall trend statistic per key: S = sum over ordered bucket
    pairs of sign(v_j - v_i), t_i < t_j — the trend half of ArcGIS
    "Emerging Hot Spot Analysis", stacked on the per-bucket Gi* z-scores.

    S is a pure integer (signs of differences of bit-identical doubles),
    so the classification thresholds never sit on an engine-dependent
    boundary.  Per-key pair join; per-key cost is quadratic in BUCKETS
    (a small constant — weeks/months), not in data.

    Returns (*by, n_buckets, mk_s).
    """
    a = scored.select(
        *by, F.col(t).alias("_ta"), F.col(v).alias("_va")
    )
    b = scored.select(
        *by, F.col(t).alias("_tb"), F.col(v).alias("_vb")
    )
    pairs = a.join(b, on=list(by), how="inner").where(F.col("_ta") < F.col("_tb"))
    sgn = (
        F.when(F.col("_vb") > F.col("_va"), 1)
        .when(F.col("_vb") < F.col("_va"), -1)
        .otherwise(0)
    )
    counts = scored.groupBy(*by).agg(F.count("*").alias("n_buckets"))
    s = pairs.groupBy(*by).agg(F.sum(sgn).alias("mk_s"))
    return counts.join(s, on=list(by), how="left").select(
        *by, "n_buckets", F.coalesce("mk_s", F.lit(0)).alias("mk_s")
    )


def mann_kendall_py(series: list[float]) -> int:
    """Pure-python twin: S over the in-order series."""
    s = 0
    for i in range(len(series)):
        for j in range(i + 1, len(series)):
            s += (series[j] > series[i]) - (series[j] < series[i])
    return s


def theil_sen_slope(
    scored: DataFrame, by: tuple[str, ...], t: str, v: str
) -> DataFrame:
    """Theil-Sen slope estimator per key — the MAGNITUDE companion to
    Mann-Kendall's direction (ArcGIS Emerging Hot Spot reports both): the
    median over all bucket pairs t_i < t_j of (v_j - v_i) / (t_j - t_i),
    robust to outlier buckets where least squares is not.

    Median convention (deterministic in both engines): with the n_pairs
    slopes sorted ascending, take ranks floor((n+1)/2) and ceil((n+1)/2)
    and average them — the classic textbook median for both parities.
    Each slope is one double division of exact integer-derived operands
    and the average is (lo + hi) / 2 of identical doubles, so the result
    is bit-equal cross-engine. Equal slopes make rank selection
    order-independent (the value AT a rank is unique even if row order
    under ties is not).

    Per-key pair join, quadratic in BUCKETS (weeks/months — a small
    constant), linear in keys; one hash exchange on the key.

    Returns (*by, n_buckets, n_pairs, ts_slope) — keys with < 2 buckets
    get n_pairs = 0 and NULL slope.
    """
    a = scored.select(*by, F.col(t).alias("_ta"), F.col(v).alias("_va"))
    b = scored.select(*by, F.col(t).alias("_tb"), F.col(v).alias("_vb"))
    pairs = (
        a.join(b, on=list(by), how="inner")
        .where(F.col("_ta") < F.col("_tb"))
        .select(
            *by,
            (
                (F.col("_vb") - F.col("_va")).cast("double")
                / (F.col("_tb") - F.col("_ta")).cast("double")
            ).alias("_slope"),
        )
    )
    w = Window.partitionBy(*by).orderBy("_slope")
    ranked = pairs.select(
        *by, "_slope",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy(*by)).alias("_n"),
    )
    picked = ranked.where(
        (F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
        | (F.col("_rn") == F.ceil((F.col("_n") + 1) / 2))
    )
    med = picked.groupBy(*by).agg(
        F.max("_n").alias("n_pairs"),
        ((F.min("_slope") + F.max("_slope")) / F.lit(2.0)).alias("_med0"),
    )
    # odd n: one picked row -> min==max -> average is the row itself;
    # even n: two picked rows -> (lo+hi)/2
    keys = scored.groupBy(*by).agg(F.count("*").alias("n_buckets"))
    out = keys.join(med, on=list(by), how="left").select(
        *by,
        "n_buckets",
        F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
        F.col("_med0").alias("ts_slope"),
    )
    return out


def theil_sen_py(points: list[tuple[int, float]]) -> float | None:
    """Scalar twin over (t, v) points (in any order)."""
    slopes = []
    for i in range(len(points)):
        for j in range(len(points)):
            if points[i][0] < points[j][0]:
                slopes.append(
                    (points[j][1] - points[i][1]) / float(points[j][0] - points[i][0])
                )
    if not slopes:
        return None
    slopes.sort()
    n = len(slopes)
    lo = (n + 1) // 2
    hi = (n + 2) // 2
    return (slopes[lo - 1] + slopes[hi - 1]) / 2.0


def theil_sen_sql(scored_cte: str, by: tuple[str, ...], t: str, v: str) -> str:
    """DuckDB twin of :func:`theil_sen_slope`: binds ``ts_out`` with
    columns (*by, n_pairs, ts_slope); select from it."""
    gc = ", ".join(by)
    on = " AND ".join(f"a.{c} = b.{c}" for c in by)
    sel = ", ".join(f"a.{c} AS {c}" for c in by)
    return f"""
    ts_pairs AS (
      SELECT {sel},
             CAST(b.{v} - a.{v} AS DOUBLE)
               / CAST(b.{t} - a.{t} AS DOUBLE) AS slope
      FROM {scored_cte} a JOIN {scored_cte} b ON {on} AND a.{t} < b.{t}
    ),
    ts_ranked AS (
      SELECT {gc}, slope,
             ROW_NUMBER() OVER (PARTITION BY {gc} ORDER BY slope) AS rn,
             COUNT(*) OVER (PARTITION BY {gc}) AS n
      FROM ts_pairs
    ),
    ts_med AS (
      SELECT {gc}, MAX(n) AS n_pairs,
             (MIN(slope) + MAX(slope)) / 2.0 AS ts_slope
      FROM ts_ranked
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      GROUP BY {gc}
    ),
    ts_keys AS (
      SELECT {gc}, CAST(COUNT(*) AS BIGINT) AS n_buckets
      FROM {scored_cte} GROUP BY {gc}
    ),
    ts_out AS (
      SELECT k.*, COALESCE(m.n_pairs, 0) AS n_pairs, m.ts_slope
      FROM ts_keys k LEFT JOIN ts_med m USING ({gc})
    )
    """
