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
