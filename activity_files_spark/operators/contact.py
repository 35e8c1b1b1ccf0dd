"""Spatiotemporal contact join: pairs of events from DISTINCT users within
``radius_m`` meters (haversine, inclusive) AND ``window_s`` seconds
(inclusive) of each other — the proximity/"close encounter" primitive that
extends the repo's spatial-only ST_DWithin (`spatial.within_radius_join`)
with a time axis. The reference engine has no self-join analytics at all
(activity_files processes one file at a time); this is part of the
training-data-pipeline surface SURVEY.md §6 calls for, built to the same
discipline as the other spatial joins.

Plan shape (100 TB discipline)
------------------------------
A naive self-join is O(n²). Instead each event is keyed by its zoom-``z``
web-mercator cell and a ``window_s``-wide time bucket, and the join is a
pure EQUI-join on ``(cell, bucket)``:

- **Right side** carries each event ONCE under its native key.
- **Left side** expands each event to the cells of its disk's bounding box
  × 3 adjacent buckets. The box is provably complete: great-circle
  distance satisfies d ≥ R·|Δφ| and d ≥ R·cos(φ_band)·|Δλ|, so every
  within-radius partner lies within ``±radius/ky`` degrees latitude and
  ``±radius/(ky·cos(band))`` degrees longitude (`spatial.within_radius_join`
  uses the same bound driver-side; here it is columnar because every row
  is its own center). Mercator tile x/y are monotone in lon/lat, so the
  partner's native tile is inside the box's tile range; and |Δt| ≤ W with
  W-wide buckets means the partner's bucket is within ±1.
- Each unordered pair is counted EXACTLY once: the right event owns one
  key, the left event's expanded keys are distinct, so a given ordered
  pair meets at most once, and the ``id_l < id_r`` join predicate keeps
  one of the two orders.
- The exact refine (integer-µs |Δt| ≤ W·1e6, bit-identical haversine
  ≤ radius, distinct users) runs inside the join projection.

At corpus scale the shuffle is one hash exchange per side on
``(cell, bucket)``; candidates per key are |events in one cell in one
window|, never n². Dense-cell skew is AQE's skew-join case (the key safely
splits: refinement is per-row). Pick ``z`` so a tile edge is >= the box
diameter (2·radius) — then the box spans ≤ 2 tiles per axis and the
expansion is ≤ 4 cells × 3 buckets = 12 copies.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from activity_files_spark.functions.geo import EARTH_RADIUS_M, haversine_m, haversine_sql
from activity_files_spark.functions.quadkey import tile_xy_col

_KY = math.radians(1.0) * EARTH_RADIUS_M  # meters per degree latitude


def _pack(x: Column, y: Column, z: int) -> Column:
    return F.shiftleft(x, z).bitwiseOR(y)


def contact_join(
    points: DataFrame,
    radius_m: float,
    window_s: float,
    z: int = 16,
    user: str = "user_id",
    id_col: str = "event_id",
    t_us: str = "t_us",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Return one row per unordered contact pair of events from distinct
    users: columns ``user_a < user_b`` (by value), ``id_a < id_b`` (the
    pair's event ids in id order), ``t_us_a/t_us_b`` (their epoch
    microseconds) and ``dist_m``. ``points`` must carry integer ``t_us``
    (epoch microseconds — use ``F.unix_micros``) plus user/id/lat/lon.
    """
    w_us = int(round(window_s * 1_000_000))
    buf_lat = radius_m / _KY

    cols = [F.col(user).alias("_u"), F.col(id_col).alias("_i"),
            F.col(t_us).alias("_t"), F.col(lat).alias("_la"), F.col(lon).alias("_lo")]
    base = points.select(*cols).withColumn("_b", F.expr(f"_t div {w_us}"))
    band = F.least(F.abs(F.col("_la")) + F.lit(buf_lat), F.lit(89.9))
    buf_lon = F.lit(radius_m) / (F.lit(_KY) * F.cos(band * F.lit(math.pi / 180.0)))

    # right: native key, once per event
    rx, ry = tile_xy_col(F.col("_la"), F.col("_lo"), z)
    right = base.select(
        F.col("_u").alias("u_r"), F.col("_i").alias("i_r"),
        F.col("_t").alias("t_r"), F.col("_la").alias("la_r"),
        F.col("_lo").alias("lo_r"),
        _pack(rx, ry, z).alias("cell"), F.col("_b").alias("bucket"),
    )

    # left: bounding-box cells x 3 buckets
    x_lo, _ = tile_xy_col(F.col("_la"), F.col("_lo") - buf_lon, z)
    x_hi, _ = tile_xy_col(F.col("_la"), F.col("_lo") + buf_lon, z)
    _, y_lo = tile_xy_col(F.col("_la") + F.lit(buf_lat), F.col("_lo"), z)
    _, y_hi = tile_xy_col(F.col("_la") - F.lit(buf_lat), F.col("_lo"), z)
    left = (
        base.withColumn("_x", F.explode(F.sequence(x_lo, x_hi)))
        .withColumn("_y", F.explode(F.sequence(y_lo, y_hi)))
        .withColumn("_db", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("_u").alias("u_l"), F.col("_i").alias("i_l"),
            F.col("_t").alias("t_l"), F.col("_la").alias("la_l"),
            F.col("_lo").alias("lo_l"),
            _pack(F.col("_x"), F.col("_y"), z).alias("cell"),
            (F.col("_b") + F.col("_db")).alias("bucket"),
        )
    )

    d = haversine_m(F.col("la_l"), F.col("lo_l"), F.col("la_r"), F.col("lo_r"))
    j = (
        left.join(right, ["cell", "bucket"])
        .where(F.col("i_l") < F.col("i_r"))
        .where(F.col("u_l") != F.col("u_r"))
        .where(F.abs(F.col("t_l") - F.col("t_r")) <= F.lit(w_us))
        .withColumn("dist_m", d)
        .where(F.col("dist_m") <= F.lit(radius_m))
    )
    return j.select(
        F.least("u_l", "u_r").alias("user_a"),
        F.greatest("u_l", "u_r").alias("user_b"),
        F.col("i_l").alias("id_a"), F.col("i_r").alias("id_b"),
        F.col("t_l").alias("t_us_a"), F.col("t_r").alias("t_us_b"),
        "dist_m",
    )


def contact_join_sql(
    pts_cte: str,
    radius_m: float,
    window_s: float,
    user: str = "user_id",
    id_col: str = "event_id",
    t_us: str = "t_us",
    lat: str = "lat",
    lon: str = "lon",
) -> str:
    """DuckDB oracle twin: brute range self-join (DuckDB's IEJoin handles
    the |Δt| band) with the IDENTICAL haversine IEEE sequence and the same
    inclusive compares — deliberately a DIFFERENT algorithm (no cells, no
    buckets) so it independently checks the cover's completeness. Binds
    ``ct_pairs``; select from it."""
    w_us = int(round(window_s * 1_000_000))
    d = haversine_sql(f"a.{lat}", f"a.{lon}", f"b.{lat}", f"b.{lon}")
    return f"""
    ct_pairs AS (
      SELECT least(a.{user}, b.{user}) AS user_a,
             greatest(a.{user}, b.{user}) AS user_b,
             a.{id_col} AS id_a, b.{id_col} AS id_b,
             a.{t_us} AS t_us_a, b.{t_us} AS t_us_b,
             {d} AS dist_m
      FROM {pts_cte} a JOIN {pts_cte} b
        ON b.{t_us} BETWEEN a.{t_us} - {w_us} AND a.{t_us} + {w_us}
       AND a.{id_col} < b.{id_col}
      WHERE a.{user} <> b.{user} AND {d} <= {radius_m!r}
    )
    """


__all__ = ["contact_join", "contact_join_sql"]
