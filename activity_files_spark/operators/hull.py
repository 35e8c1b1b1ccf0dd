"""Convex hull per track: the route's bounding polygon.

The geometry primitive (PostGIS ``ST_ConvexHull``) behind "how spread out
is this route" analytics: hull vertex count, hull perimeter, and the
hull vertex set itself. Not in the reference (no cross-point geometry
beyond distance sums); built fresh for the geospatial tier.

Spark-first shape:

- one shuffle groups each key's points; the hull itself is Andrew's
  monotone chain (O(n log n)) inside an applyInPandas kernel — hulls are
  per-key independent, nothing leaves the executor but the (tiny) vertex
  set.
- every orientation test is the raw IEEE cross product
  ``(bx-ax)*(cy-ay) - (by-ay)*(cx-ax)`` in PLAIN SCALAR arithmetic (no
  numpy reductions, no fused ops), the exact expression the DuckDB
  oracle evaluates — multiplies and subtracts are IEEE-exact-determined
  in every engine, so the sign decisions agree bit-for-bit.
- the oracle does not re-run the chain: it replays the hull's
  DEFINITION — (a, b) is a hull edge iff every other point of the key
  lies STRICTLY left of a->b — as one pairs x points equi-join on key
  with a zero-violations aggregate (explicit join + GROUP BY, not a
  correlated NOT EXISTS, so the planner cannot degrade it to a nested
  loop over the corpus). Two independent algorithms, one hash.

STRICTLY left means the gate requires points in general position (no 3
collinear points among hull candidates); callers feed parametric curves
(spirals/sine tracks), not the collinear-rich integer lattice. The
kernel drops collinear points the same way (``> 0`` keeps, ``<= 0``
pops), so the two sides agree on any input where no cross product is
exactly 0.0 on a hull edge.

At 10^12 points: the kernel is per-key linear after an in-partition
sort; the definitional oracle is test-tier only (O(n² · n) per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from activity_files_spark.operators.grouped import grouped_apply


def _cross(ax, ay, bx, by, cx, cy):
    # plain scalar IEEE ops — the same expression string the SQL twin uses
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def convex_hull_py(pts):
    """Andrew monotone chain over [(x, y, tag)] -> hull vertex tags in
    counterclockwise order starting at the lexicographic minimum.
    Collinear points are dropped (strict turns). len < 3 returns all."""
    pts = sorted(pts)
    if len(pts) <= 2:
        return [t for _, _, t in pts]
    lower = []
    for p in pts:
        while len(lower) >= 2 and _cross(
            lower[-2][0], lower[-2][1], lower[-1][0], lower[-1][1], p[0], p[1]
        ) <= 0.0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(
            upper[-2][0], upper[-2][1], upper[-1][0], upper[-1][1], p[0], p[1]
        ) <= 0.0:
            upper.pop()
        upper.append(p)
    return [t for _, _, t in lower[:-1]] + [t for _, _, t in upper[:-1]]


def convex_hull(
    pts: DataFrame,
    key: str = "user_id",
    seq: str = "seq",
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Hull vertices per key: (key, seq, hull_order) with hull_order the
    0-based counterclockwise position starting at the lexicographic
    (x, y) minimum. Points are tagged by ``seq`` (any per-key-unique
    integer)."""
    import pandas as pd

    out_schema = (
        f"{key} {pts.schema[key].dataType.simpleString()}, "
        "seq long, hull_order long"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        kval = pdf[key].iloc[0]
        tags = convex_hull_py(
            list(zip(pdf[x].tolist(), pdf[y].tolist(), pdf[seq].tolist()))
        )
        return pd.DataFrame(
            {key: kval, "seq": [int(t) for t in tags],
             "hull_order": list(range(len(tags)))}
        )

    return grouped_apply(pts, key, kernel, out_schema)


def convex_hull_sql(
    pts_cte: str,
    key: str = "user_id",
    seq: str = "seq",
    x: str = "lon",
    y: str = "lat",
) -> str:
    """DuckDB oracle body over a CTE named ``pts_cte`` with columns
    (key, seq, x, y), general-position input: binds ch_pairs / ch_edges /
    ch_start / ch_verts (key, seq, hull_order). The hull-order walk is a
    window trick, not a recursion: counterclockwise order around a convex
    polygon == order by angle from the centroid, anchored at the
    lexicographic minimum vertex. Requires >= 3 points per key."""
    cross = (
        f"(b.{x} - a.{x}) * (p.{y} - a.{y}) - (b.{y} - a.{y}) * (p.{x} - a.{x})"
    )
    return f"""
    ch_pairs AS (
      SELECT a.{key} AS key, a.{seq} AS sa, b.{seq} AS sb,
             a.{x} AS ax, a.{y} AS ay
      FROM {pts_cte} a JOIN {pts_cte} b
        ON a.{key} = b.{key} AND a.{seq} <> b.{seq}
    ),
    ch_edges AS (
      SELECT pr.key, pr.sa, pr.sb
      FROM {pts_cte} a
      JOIN ch_pairs pr ON pr.key = a.{key} AND pr.sa = a.{seq}
      JOIN {pts_cte} b ON b.{key} = pr.key AND b.{seq} = pr.sb
      JOIN {pts_cte} p ON p.{key} = pr.key
      WHERE p.{seq} <> pr.sa AND p.{seq} <> pr.sb
      GROUP BY pr.key, pr.sa, pr.sb
      HAVING MIN({cross}) > 0.0
    ),
    ch_vset AS (
      SELECT DISTINCT e.key, e.sa AS seq FROM ch_edges e
    ),
    ch_cent AS (
      SELECT v.key, AVG(p.{x}) AS cx, AVG(p.{y}) AS cy
      FROM ch_vset v JOIN {pts_cte} p
        ON p.{key} = v.key AND p.{seq} = v.seq
      GROUP BY v.key
    ),
    ch_anchor AS (
      SELECT key, seq FROM (
        SELECT v.key, v.seq,
               ROW_NUMBER() OVER (
                 PARTITION BY v.key ORDER BY p.{x}, p.{y}, p.{seq}
               ) AS rn
        FROM ch_vset v JOIN {pts_cte} p
          ON p.{key} = v.key AND p.{seq} = v.seq
      ) WHERE rn = 1
    ),
    ch_ang AS (
      SELECT v.key, v.seq,
             ATAN2(p.{y} - c.cy, p.{x} - c.cx) AS ang,
             ATAN2(ap.{y} - c.cy, ap.{x} - c.cx) AS ang0
      FROM ch_vset v
      JOIN {pts_cte} p ON p.{key} = v.key AND p.{seq} = v.seq
      JOIN ch_cent c ON c.key = v.key
      JOIN ch_anchor an ON an.key = v.key
      JOIN {pts_cte} ap ON ap.{key} = an.key AND ap.{seq} = an.seq
    ),
    ch_verts AS (
      SELECT key, seq,
             ROW_NUMBER() OVER (
               PARTITION BY key
               ORDER BY CASE WHEN ang >= ang0 THEN ang ELSE ang + 2 * PI() END,
                        seq
             ) - 1 AS hull_order
      FROM ch_ang
    )
    """


__all__ = ["convex_hull", "convex_hull_py", "convex_hull_sql"]
