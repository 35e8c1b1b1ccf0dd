"""Trajectory similarity: route cell signatures, exact cell-Jaccard pair
mining, top-k most-similar-route selection, and cell-snapped symmetric
Hausdorff refinement.

Not in the reference (which parses one activity file at a time and never
compares tracks); this is the route-dedup twin of the document near-dup
stack (operators/dedup.py) for the geospatial tier: "find the routes that
are near-duplicates of mine" over a corpus of millions of activities.

Plan shapes, 100 TB first:

- **Signature** = the route's DISTINCT zoom-``z`` tile set
  (:func:`route_cells`): one narrow shuffle (distinct on (key, cx, cy)),
  output bounded by track length / cell size, not point count — a 100k-point
  activity collapses to a few hundred cells.
- **Candidates** = self-equi-join on tile (:func:`route_pair_jaccard`):
  only routes sharing >= 1 cell ever meet, Jaccard is exact (shared /
  (|A| + |B| - shared)) from counting — integer arithmetic + one division,
  so the DuckDB twin is bit-identical. Dense cells (popular trailheads)
  create quadratic pair blowup per cell — the documented mitigations are
  the same as document near-dup: cap per-cell fan-out upstream, or switch
  the candidate stage to the MinHash miner (dedup.py) with cell ids as the
  shingle vocabulary; the refine below is unchanged.
- **Top-k** (:func:`top_similar_routes`): per-route window rank by
  (jaccard desc, other-id asc) — deterministic at every corpus density,
  unlike a fixed global threshold.
- **Refine** (:func:`hausdorff_refine`): symmetric Hausdorff distance over
  the two routes' TILE CENTERS — max over A of min over B of haversine,
  both directions. Snapping to cell centers bounds the candidate product at
  |cells_A| x |cells_B| (not points x points) and makes every float
  reproducible (tile centers are exact functions of integer tile coords);
  the approximation error vs point-level Hausdorff is at most one cell
  diagonal on each side. Aggregation is min-then-max — order-independent
  exact comparisons, one partial-agg shuffle per direction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from activity_files_spark.functions.geo import haversine_m, haversine_sql
from activity_files_spark.functions.quadkey import tile_xy_col, tile_xy_sql


def route_cells(
    points: DataFrame, z: int, key: str = "user_id",
    lat: str = "lat", lon: str = "lon",
) -> DataFrame:
    """Distinct zoom-``z`` tiles visited per route: (key, cx, cy)."""
    x, y = tile_xy_col(F.col(lat), F.col(lon), z)
    return points.select(
        F.col(key), x.alias("cx"), y.alias("cy")
    ).distinct()


def route_pair_jaccard(cells: DataFrame, key: str = "user_id") -> DataFrame:
    """All route pairs sharing >= 1 cell, with exact cell-set Jaccard.

    Output: (key_a, key_b, n_shared, n_a, n_b, jaccard), key_a < key_b.
    """
    counts = cells.groupBy(key).agg(F.count("*").alias("n"))
    a = cells.select(F.col(key).alias("key_a"), "cx", "cy")
    b = cells.select(F.col(key).alias("key_b"), "cx", "cy")
    shared = (
        a.join(b, ["cx", "cy"])
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("n_shared"))
    )
    ca = counts.select(F.col(key).alias("key_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col(key).alias("key_b"), F.col("n").alias("n_b"))
    return (
        shared.join(ca, "key_a")
        .join(cb, "key_b")
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
    )


def top_similar_routes(pairs: DataFrame, k: int = 1) -> DataFrame:
    """Per route (either side of the pair), its ``k`` most similar other
    routes by (jaccard desc, other asc). Symmetrizes the a<b pair list
    first so every route gets a ranking."""
    sym = pairs.select(
        F.col("key_a").alias("key"), F.col("key_b").alias("other"),
        "n_shared", "jaccard",
    ).unionByName(
        pairs.select(
            F.col("key_b").alias("key"), F.col("key_a").alias("other"),
            "n_shared", "jaccard",
        )
    )
    w = Window.partitionBy("key").orderBy(F.col("jaccard").desc(), F.col("other").asc())
    return sym.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _tile_center_cols(cx, cy, z: int):
    n = float(1 << z)
    lon = (cx + F.lit(0.5)) / F.lit(n) * F.lit(360.0) - F.lit(180.0)
    targ = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * (cy + F.lit(0.5)) / F.lit(n))
    lat = F.atan((F.exp(targ) - F.exp(-targ)) / F.lit(2.0)) * F.lit(180.0 / math.pi)
    return lat, lon


def tile_center_sql(cx: str, cy: str, z: int) -> tuple[str, str]:
    """SQL twins of :func:`_tile_center_cols` — same IEEE op sequence,
    pi-derived constants embedded as exact repr literals."""
    n = float(1 << z)
    lon = f"(({cx} + 0.5) / {n!r} * 360.0 - 180.0)"
    targ = f"({math.pi!r} * (1.0 - 2.0 * ({cy} + 0.5) / {n!r}))"
    lat = f"(ATAN((EXP({targ}) - EXP(-{targ})) / 2.0) * {180.0 / math.pi!r})"
    return lat, lon


def hausdorff_refine(
    pairs: DataFrame, cells: DataFrame, z: int, key: str = "user_id"
) -> DataFrame:
    """Symmetric Hausdorff distance (meters, haversine over tile centers)
    for each (key, other) pair. Returns pairs + ``hausdorff_m``.

    Directed distance both ways from one joined product:
    min over B per A-cell -> max; min over A per B-cell -> max; greatest.
    """
    lat_a, lon_a = _tile_center_cols(F.col("acx"), F.col("acy"), z)
    lat_b, lon_b = _tile_center_cols(F.col("bcx"), F.col("bcy"), z)
    ca = cells.select(
        F.col(key).alias("key"), F.col("cx").alias("acx"), F.col("cy").alias("acy")
    )
    cb = cells.select(
        F.col(key).alias("other"), F.col("cx").alias("bcx"), F.col("cy").alias("bcy")
    )
    prod = (
        pairs.select("key", "other")
        .join(ca, "key")
        .join(cb, "other")
        .withColumn("d", haversine_m(lat_a, lon_a, lat_b, lon_b))
    )
    h_ab = (
        prod.groupBy("key", "other", "acx", "acy")
        .agg(F.min("d").alias("dmin"))
        .groupBy("key", "other")
        .agg(F.max("dmin").alias("h_ab"))
    )
    h_ba = (
        prod.groupBy("key", "other", "bcx", "bcy")
        .agg(F.min("d").alias("dmin"))
        .groupBy("key", "other")
        .agg(F.max("dmin").alias("h_ba"))
    )
    return pairs.join(h_ab, ["key", "other"]).join(h_ba, ["key", "other"]).withColumn(
        "hausdorff_m", F.greatest(F.col("h_ab"), F.col("h_ba"))
    ).drop("h_ab", "h_ba")


def route_similarity_sql(
    pts_cte: str, z: int, k: int = 1, key: str = "user_id",
    refine_z: int | None = None,
) -> str:
    """DuckDB oracle body for route_cells -> route_pair_jaccard ->
    top_similar_routes(k) -> hausdorff_refine, over a CTE named ``pts_cte``
    with columns (key, lat, lon). Binds CTEs rc_cells .. rc_final; the
    caller selects from ``rc_final``. ``refine_z`` (default ``z``) is the
    coarser zoom the Hausdorff refine snaps to — the |cells|² product per
    pair shrinks 4x per level while the signature Jaccard stays at ``z``."""
    rz = z if refine_z is None else refine_z
    x, y = tile_xy_sql("lat", "lon", z)
    xr, yr = tile_xy_sql("lat", "lon", rz)
    clat_a, clon_a = tile_center_sql("acx", "acy", rz)
    clat_b, clon_b = tile_center_sql("bcx", "bcy", rz)
    hav = haversine_sql("alat", "alon", "blat", "blon")
    return f"""
    rc_cells AS (
      SELECT DISTINCT {key} AS key, {x} AS cx, {y} AS cy FROM {pts_cte}
    ),
    rc_counts AS (
      SELECT key, COUNT(*) AS n FROM rc_cells GROUP BY key
    ),
    rc_shared AS (
      SELECT a.key AS key_a, b.key AS key_b, COUNT(*) AS n_shared
      FROM rc_cells a JOIN rc_cells b
        ON a.cx = b.cx AND a.cy = b.cy AND a.key < b.key
      GROUP BY 1, 2
    ),
    rc_pairs AS (
      SELECT key_a, key_b, n_shared, ca.n AS n_a, cb.n AS n_b,
             CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared) AS jaccard
      FROM rc_shared
      JOIN rc_counts ca ON ca.key = key_a
      JOIN rc_counts cb ON cb.key = key_b
    ),
    rc_top AS (
      SELECT key, other, n_shared, jaccard FROM (
        SELECT key_a AS key, key_b AS other, n_shared, jaccard FROM rc_pairs
        UNION ALL
        SELECT key_b AS key, key_a AS other, n_shared, jaccard FROM rc_pairs
      )
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY key ORDER BY jaccard DESC, other ASC
      ) <= {k}
    ),
    rc_cells_r AS (
      SELECT DISTINCT {key} AS key, {xr} AS cx, {yr} AS cy FROM {pts_cte}
    ),
    rc_prod AS (
      SELECT t.key, t.other,
             a.cx AS acx, a.cy AS acy, b.cx AS bcx, b.cy AS bcy
      FROM rc_top t
      JOIN rc_cells_r a ON a.key = t.key
      JOIN rc_cells_r b ON b.key = t.other
    ),
    rc_dist AS (
      SELECT key, other, acx, acy, bcx, bcy,
             {hav} AS d
      FROM (
        SELECT key, other, acx, acy, bcx, bcy,
               {clat_a} AS alat, {clon_a} AS alon,
               {clat_b} AS blat, {clon_b} AS blon
        FROM rc_prod
      )
    ),
    rc_hab AS (
      SELECT key, other, MAX(dmin) AS h_ab FROM (
        SELECT key, other, acx, acy, MIN(d) AS dmin
        FROM rc_dist GROUP BY key, other, acx, acy
      ) GROUP BY key, other
    ),
    rc_hba AS (
      SELECT key, other, MAX(dmin) AS h_ba FROM (
        SELECT key, other, bcx, bcy, MIN(d) AS dmin
        FROM rc_dist GROUP BY key, other, bcx, bcy
      ) GROUP BY key, other
    ),
    rc_final AS (
      SELECT t.key, t.other, t.n_shared, t.jaccard,
             GREATEST(h_ab, h_ba) AS hausdorff_m
      FROM rc_top t
      JOIN rc_hab USING (key, other)
      JOIN rc_hba USING (key, other)
    )
    """


__all__ = [
    "route_cells",
    "route_pair_jaccard",
    "top_similar_routes",
    "hausdorff_refine",
    "tile_center_sql",
    "route_similarity_sql",
]
