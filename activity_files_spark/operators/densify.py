"""Track densification (ST_Segmentize): insert interpolated vertices so no
segment step exceeds a maximum spacing — the pre-pass for map rendering,
map matching, and cell-cover writers that assume dense sampling.

The reference resamples onto a TIME grid (`lib/src/transforms/
raw_editor.dart` resample; repo twin `operators/asof.py::resample_linear`)
and the repo adds a cumulative-DISTANCE grid (`resample_by_distance`).
This operator is the third axis: per-SEGMENT geometric subdivision, the
PostGIS `ST_Segmentize` shape (planar lerp between the segment's own
endpoints; no cross-segment grid).

Exactness design: the split count must be identical in both engines, but
any count derived from a haversine length crosses a ``ceil`` threshold on
a trig double — a 1-ulp engine divergence flips it.  So the count is PURE
INTEGER: endpoints snap to the usual z+q mercator lattice and
``n = ceil(chebyshev(dx, dy) / K)`` for a spacing of K lattice units,
computed with floor-div identities both engines share.  Only the lerp
itself touches doubles — ``lat0 + (lat1-lat0) * (i/n)`` with integer
``i, n`` — the same IEEE expression tree on both sides, so interpolated
coordinates are bit-identical.

Scale shape: one lag window per route, one bounded explode
(``F.sequence(0, n-1)``; output IS the densified track), zero joins —
linear in output size like the supercover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def densify_tracks(
    points: DataFrame,
    k_units: int,
    key: str = "key",
) -> DataFrame:
    """Densified vertices per route.

    ``points``: (key, ord_cols..., lat, lon, x, y) where ``x, y`` are the
    BIGINT lattice twins of (lat, lon) and rows are already tagged with a
    per-route dense rank ``seq`` (0-based, time order).  Emits
    ``(key, seq, i, n, lat, lon)``: for every segment seq-1→seq, rows
    i = 0..n-1 interpolate from the segment start (i=0 is the original
    start vertex); each route's final vertex is emitted with i = n = 0 so
    the full densified polyline is the seq-then-i order.
    """
    w = Window.partitionBy("key").orderBy("seq")
    seg = points.select(
        "key",
        "seq",
        F.lag("lat").over(w).alias("lat0"),
        F.lag("lon").over(w).alias("lon0"),
        "lat",
        "lon",
        (F.col("x") - F.lag("x").over(w)).alias("dx"),
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
    )
    last = (
        points.withColumn(
            "_rn", F.row_number().over(w.orderBy(F.col("seq").desc()))
        )
        .where(F.col("_rn") == 1)
        .select(
            "key",
            "seq",
            F.lit(0).alias("i"),
            F.lit(0).alias("n"),
            "lat",
            "lon",
        )
    )
    cheb = F.greatest(F.abs(F.col("dx")), F.abs(F.col("dy")))
    # integer ceil-div, exact in both engines; zero-length segments keep
    # one vertex (n = 1)
    n = F.greatest(
        ((cheb + F.lit(k_units - 1)) - ((cheb + F.lit(k_units - 1)) % F.lit(k_units)))
        / F.lit(k_units),
        F.lit(1),
    ).cast("long")
    mid = (
        seg.where(F.col("lat0").isNotNull())
        .withColumn("n", n)
        .select(
            "key",
            "seq",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("i"),
            "n",
            "lat0",
            "lon0",
            "lat",
            "lon",
        )
        .select(
            "key",
            (F.col("seq") - 1).alias("seq"),
            "i",
            "n",
            (
                F.col("lat0")
                + (F.col("lat") - F.col("lat0"))
                * (F.col("i").cast("double") / F.col("n").cast("double"))
            ).alias("lat"),
            (
                F.col("lon0")
                + (F.col("lon") - F.col("lon0"))
                * (F.col("i").cast("double") / F.col("n").cast("double"))
            ).alias("lon"),
        )
    )
    return mid.unionByName(last)


def line_interpolate_points(
    points: DataFrame,
    fracs: list[tuple[int, int]],
    key: str = "key",
) -> DataFrame:
    """ST_LineInterpolatePoint: the vertex at fraction num/den of each
    route's length, for every (num, den) in ``fracs``.

    Length is parameterized on the INTEGER lattice (L1 per segment, like
    :func:`densify_tracks`' chebyshev split counts): the running total,
    the target ``num * total`` and the bracket search
    ``den*cum_prev < num*total <= den*cum_i`` are all exact BIGINT — a
    haversine cumsum would make the bracket flip on DuckDB's segment-tree
    vs Spark's sequential window summation.  Only the final lerp touches
    doubles, from exact integer operands, with one fixed expression tree.

    ``points``: (key, seq, lat, lon, x, y) as in :func:`densify_tracks`.
    Returns (key, num, den, seq, lat, lon): ``seq`` is the bracket
    segment's end vertex.  Routes with zero total length emit nothing
    (the fraction of a point is undefined), matching the SQL twin.
    """
    w = Window.partitionBy("key").orderBy("seq")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    step = F.abs(F.col("x") - F.lag("x").over(w)) + F.abs(
        F.col("y") - F.lag("y").over(w)
    )
    d = points.select(
        "key",
        "seq",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("lat0"),
        F.lag("lon").over(w).alias("lon0"),
        F.coalesce(step, F.lit(0)).alias("step"),
    )
    d = d.select(
        "*",
        F.sum("step").over(wcum).alias("cum"),
        F.sum("step").over(wall).alias("total"),
    )
    fr = F.explode(
        F.array(
            *[
                F.struct(F.lit(n).alias("num"), F.lit(dn).alias("den"))
                for n, dn in fracs
            ]
        )
    )
    d = d.select("*", fr.alias("f")).select(
        "*", F.col("f.num").alias("num"), F.col("f.den").alias("den")
    )
    bracket = (
        (F.col("den") * (F.col("cum") - F.col("step")) < F.col("num") * F.col("total"))
        & (F.col("num") * F.col("total") <= F.col("den") * F.col("cum"))
        & (F.col("step") > 0)
    )
    # t = (num*total/den - cum_prev) / step — as exact-integer operands
    t = (
        (F.col("num") * F.col("total") - F.col("den") * (F.col("cum") - F.col("step")))
        .cast("double")
        / (F.col("den") * F.col("step")).cast("double")
    )
    return d.where(bracket).select(
        "key",
        "num",
        "den",
        "seq",
        (F.col("lat0") + (F.col("lat") - F.col("lat0")) * t).alias("lat"),
        (F.col("lon0") + (F.col("lon") - F.col("lon0")) * t).alias("lon"),
    )


def line_interpolate_sql(
    pts_cte: str, fracs: list[tuple[int, int]], key: str = "key"
) -> tuple[str, str]:
    """DuckDB twin of :func:`line_interpolate_points`."""
    vals = ", ".join(f"({n}, {d})" for n, d in fracs)
    body = f"""liseg AS (
      SELECT {key} AS key, seq, lat, lon,
             LAG(lat) OVER w AS lat0, LAG(lon) OVER w AS lon0,
             COALESCE(ABS(x - LAG(x) OVER w) + ABS(y - LAG(y) OVER w), 0)
               AS step
      FROM {pts_cte}
      WINDOW w AS (PARTITION BY {key} ORDER BY seq)
    ), licum AS (
      SELECT *,
             SUM(step) OVER (PARTITION BY key ORDER BY seq
                             ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(step) OVER (PARTITION BY key) AS total
      FROM liseg
    ), lifr AS (
      SELECT * FROM (VALUES {vals}) AS f(num, den)
    ), libr AS (
      SELECT key, num, den, seq,
             lat0 + (lat - lat0) * (CAST(num*total - den*(cum - step) AS DOUBLE)
                                    / CAST(den*step AS DOUBLE)) AS lat,
             lon0 + (lon - lon0) * (CAST(num*total - den*(cum - step) AS DOUBLE)
                                    / CAST(den*step AS DOUBLE)) AS lon
      FROM licum, lifr
      WHERE den*(cum - step) < num*total AND num*total <= den*cum
        AND step > 0
    )"""
    return body, "libr"


def line_interpolate_py(
    pts: list[tuple[float, float, int, int]], fracs: list[tuple[int, int]]
) -> dict[tuple[int, int], tuple[int, float, float]]:
    """Pure-python twin for one route: {(num, den): (seq, lat, lon)}."""
    steps = [0] + [
        abs(b[2] - a[2]) + abs(b[3] - a[3]) for a, b in zip(pts, pts[1:])
    ]
    cum = [0]
    for s in steps[1:]:
        cum.append(cum[-1] + s)
    total = cum[-1]
    out = {}
    for num, den in fracs:
        for i in range(1, len(pts)):
            if (
                den * cum[i - 1] < num * total <= den * cum[i]
                and steps[i] > 0
            ):
                t = (num * total - den * cum[i - 1]) / (den * steps[i])
                lat = pts[i - 1][0] + (pts[i][0] - pts[i - 1][0]) * t
                lon = pts[i - 1][1] + (pts[i][1] - pts[i - 1][1]) * t
                out[(num, den)] = (i, lat, lon)
                break
    return out


def densify_py(
    pts: list[tuple[float, float, int, int]], k_units: int
) -> list[tuple[float, float]]:
    """Pure-python twin for one route: ``pts`` rows are (lat, lon, x, y)
    in order; returns the densified (lat, lon) list."""
    out: list[tuple[float, float]] = []
    for j in range(1, len(pts)):
        lat0, lon0, x0, y0 = pts[j - 1]
        lat1, lon1, x1, y1 = pts[j]
        cheb = max(abs(x1 - x0), abs(y1 - y0))
        n = max((cheb + k_units - 1) // k_units, 1)
        for i in range(n):
            t = i / n
            out.append((lat0 + (lat1 - lat0) * t, lon0 + (lon1 - lon0) * t))
    if pts:
        out.append((pts[-1][0], pts[-1][1]))
    return out


def densify_sql(
    pts_cte: str, k_units: int, key: str = "key"
) -> tuple[str, str]:
    """DuckDB twin. ``pts_cte`` exposes (key, seq, lat, lon, x, y);
    returns (cte_body, final_name) with (key, seq, i, n, lat, lon)."""
    body = f"""dseg AS (
      SELECT {key} AS key, seq,
             LAG(lat) OVER w AS lat0, LAG(lon) OVER w AS lon0, lat, lon,
             x - LAG(x) OVER w AS dx, y - LAG(y) OVER w AS dy
      FROM {pts_cte}
      WINDOW w AS (PARTITION BY {key} ORDER BY seq)
    ), dn AS (
      SELECT key, seq, lat0, lon0, lat, lon,
             GREATEST(
               (GREATEST(ABS(dx), ABS(dy)) + {k_units - 1}) // {k_units},
               1) AS n
      FROM dseg WHERE lat0 IS NOT NULL
    ), dmid AS (
      SELECT key, seq - 1 AS seq, gi.i AS i, n,
             lat0 + (lat - lat0) * (CAST(gi.i AS DOUBLE) / CAST(n AS DOUBLE))
               AS lat,
             lon0 + (lon - lon0) * (CAST(gi.i AS DOUBLE) / CAST(n AS DOUBLE))
               AS lon
      FROM dn, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) gi
    ), dlast AS (
      SELECT key, seq, 0 AS i, 0 AS n, lat, lon FROM (
        SELECT {key} AS key, seq, lat, lon,
               ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY seq DESC) AS rn
        FROM {pts_cte}
      ) t WHERE rn = 1
    ), densified AS (
      SELECT * FROM dmid UNION ALL SELECT * FROM dlast
    )"""
    return body, "densified"
