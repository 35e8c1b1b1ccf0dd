"""Rectangle-union measure (the ST_Union + ST_Area composition over
axis-aligned geofences) by relational coordinate-compression sweep.

Geofence sets overlap; "how much ground do our geofences cover" must not
double-count the overlaps. The classic sweep: compress the x boundaries
into strips, and inside each strip take the measure of the UNION of the
rects' y intervals. Everything here is exact BIGINT cell arithmetic on the
z_max lattice (the repo's geofence representation), so the result
hash-gates with zero float involvement.

Plan shape (100 TB discipline)
------------------------------
The naive strip-x-rect pairing is a range join (→ BroadcastNestedLoopJoin,
banned by the plan-lint gate). Instead the strip assignment is EQUI-only:
every rect edge is itself a compressed boundary, so a rect's first/last
strip indexes come from two equi-joins against the indexed boundary table
(ax = x and bx+1 = x match exactly, by construction), and the rect then
explodes ``sequence(i_lo, i_hi-1)`` — output-linear in strips actually
covered. Inside each strip the interval-union length is one window pass:
``covered += max(0, end - max(start, running_max_end_before))`` ordered by
start — the textbook union-of-intervals scan, expressed as a bounded-frame
window. Shuffles: one tiny boundary sort, one hash exchange on strip id.
Rect counts in the millions stream through both; no stage is quadratic
except where rects genuinely stack on one strip (the union scan is linear
in that stack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rect_union_sweep(rects: DataFrame, key: str = "region_id") -> DataFrame:
    """Union measure of inclusive integer cell rects (ax, ay, bx, by):
    one row per x-strip with ``x_lo``, ``x_hi`` (exclusive), ``n_rects``
    (rects covering the strip), ``y_covered`` (union length of their y
    intervals) and ``area`` (= width * y_covered). Total union area =
    SUM(area). All BIGINT."""
    edges = rects.select(
        F.explode(F.array(F.col("ax"), F.col("bx") + 1)).alias("x")
    ).distinct()
    wi = Window.orderBy("x")
    xs = edges.select(
        F.col("x"), F.row_number().over(wi).alias("i"), F.lead("x").over(wi).alias("x_hi")
    )
    strips = xs.where(F.col("x_hi").isNotNull()).select(
        "i", F.col("x").alias("x_lo"), "x_hi"
    )
    lo = xs.select(F.col("x").alias("ax"), F.col("i").alias("i_lo"))
    hi = xs.select((F.col("x") - 1).alias("bx"), F.col("i").alias("i_hi"))
    spans = (
        rects.join(lo, "ax")
        .join(hi, "bx")
        .select(
            F.explode(F.sequence("i_lo", (F.col("i_hi") - 1))).alias("i"),
            F.col("ay"),
            (F.col("by") + 1).alias("y_end"),
        )
    )
    wprev = (
        Window.partitionBy("i")
        .orderBy("ay", "y_end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = spans.withColumn("run_end", F.max("y_end").over(wprev)).withColumn(
        "covered",
        F.greatest(
            F.lit(0).cast("long"),
            F.col("y_end") - F.greatest(F.col("ay"), F.coalesce("run_end", F.col("ay"))),
        ),
    )
    per_strip = contrib.groupBy("i").agg(
        F.count("*").alias("n_rects"), F.sum("covered").alias("y_covered")
    )
    return (
        per_strip.join(strips, "i")
        .select(
            "x_lo",
            "x_hi",
            "n_rects",
            "y_covered",
            ((F.col("x_hi") - F.col("x_lo")) * F.col("y_covered")).alias("area"),
        )
    )


def rect_union_sweep_sql(rects_cte: str) -> str:
    """DuckDB oracle twin: the strip binning is definitional (the same
    boundary multiset), but ``y_covered`` comes from BRUTE per-cell
    enumeration — COUNT(DISTINCT y) over every rect containing the strip
    (a strip never straddles a rect edge, so membership is testable at
    x_lo) — a different algorithm than the interval-union scan. Binds
    ``ru_xs`` / ``ru_strips`` / ``ru_out``; select from ``ru_out``."""
    return f"""
    ru_xs AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS i,
             LEAD(x) OVER (ORDER BY x) AS x_hi
      FROM (SELECT DISTINCT x FROM (
        SELECT ax AS x FROM {rects_cte}
        UNION ALL SELECT bx + 1 FROM {rects_cte}))
    ),
    ru_strips AS (
      SELECT i, x AS x_lo, x_hi FROM ru_xs WHERE x_hi IS NOT NULL
    ),
    ru_cells AS (
      SELECT s.i, unnest(generate_series(r.ay, r.by)) AS y
      FROM ru_strips s
      JOIN {rects_cte} r ON r.ax <= s.x_lo AND r.bx >= s.x_lo
    ),
    ru_out AS (
      SELECT s.x_lo, s.x_hi,
             (SELECT COUNT(*) FROM {rects_cte} r
              WHERE r.ax <= s.x_lo AND r.bx >= s.x_lo) AS n_rects,
             COUNT(DISTINCT c.y) AS y_covered,
             (s.x_hi - s.x_lo) * COUNT(DISTINCT c.y) AS area
      FROM ru_strips s JOIN ru_cells c ON c.i = s.i
      GROUP BY s.i, s.x_lo, s.x_hi
    )
    """


def rect_overlap_pairs(
    rects: DataFrame, cell: int = 256, key: str = "region_id"
) -> DataFrame:
    """ST_Intersects + ST_Intersection-measure as a JOIN: every ordered
    pair of overlapping rects with the exact intersection area, union
    area, and Jaccard overlap (inclusive integer cell rects ax/ay/bx/by
    on the z_max lattice — the repo's geofence representation).

    Plan shape (100 TB discipline)
    ------------------------------
    A rect-rect range join is a BroadcastNestedLoopJoin — banned by the
    plan-lint gate and quadratic at corpus scale. Instead each rect
    explodes into the coarse ``cell``-sized grid cells it touches
    (``sequence(ax/cell, bx/cell) x sequence(ay/cell, by/cell)`` — a few
    cells per rect when ``cell`` is sized near the rect scale), candidate
    pairs come from an EQUI-join on the packed coarse cell id, and the
    exact inclusive-arithmetic refine runs inside the join projection:
    ``iw = least(bx_a, bx_b) - greatest(ax_a, ax_b) + 1`` (same for iy),
    overlap iff both positive. Completeness is by construction: a
    non-empty intersection occupies at least one coarse cell, and that
    cell is covered by BOTH rects, so every true pair collides. The
    multi-cell dedup runs on bare id pairs (``dropDuplicates`` before the
    corner columns re-attach via the refine) — the same vector-free
    exchange discipline the ANN joins use. Shuffles: one hash exchange on
    coarse cell, one on the pair key. Skewed dense cells split under AQE.

    Returns one row per overlapping pair (``key_a < key_b``):
    ``inter_area``, ``area_a``, ``area_b``, ``union_area`` (all BIGINT)
    and ``jaccard`` (DOUBLE, inter/union).
    """
    if cell <= 0:
        raise ValueError(f"cell must be positive (got {cell})")
    tagged = rects.select(
        F.col(key).alias("rid"),
        "ax", "ay", "bx", "by",
        ((F.col("bx") - F.col("ax") + 1) * (F.col("by") - F.col("ay") + 1)).alias("area"),
    )
    covered = tagged.select(
        "rid", "ax", "ay", "bx", "by", "area",
        F.explode(
            F.sequence(
                F.floor(F.col("ax") / cell).cast("long"),
                F.floor(F.col("bx") / cell).cast("long"),
            )
        ).alias("gx"),
    ).select(
        "rid", "ax", "ay", "bx", "by", "area", "gx",
        F.explode(
            F.sequence(
                F.floor(F.col("ay") / cell).cast("long"),
                F.floor(F.col("by") / cell).cast("long"),
            )
        ).alias("gy"),
    ).select(
        "rid", "ax", "ay", "bx", "by", "area",
        (F.col("gx") * F.lit(1 << 31) + F.col("gy")).alias("gcell"),
    )
    a = covered.select(F.col("rid").alias("rid_a"), F.col("gcell").alias("gcell"))
    b = covered.select(F.col("rid").alias("rid_b"), F.col("gcell").alias("gcell"))
    cand = (
        a.join(b, "gcell")
        .where(F.col("rid_a") < F.col("rid_b"))
        .select("rid_a", "rid_b")
        .dropDuplicates(["rid_a", "rid_b"])
    )
    ca = tagged.select(
        F.col("rid").alias("rid_a"), F.col("ax").alias("ax_a"), F.col("ay").alias("ay_a"),
        F.col("bx").alias("bx_a"), F.col("by").alias("by_a"), F.col("area").alias("area_a"),
    )
    cb = tagged.select(
        F.col("rid").alias("rid_b"), F.col("ax").alias("ax_b"), F.col("ay").alias("ay_b"),
        F.col("bx").alias("bx_b"), F.col("by").alias("by_b"), F.col("area").alias("area_b"),
    )
    iw = F.least("bx_a", "bx_b") - F.greatest("ax_a", "ax_b") + 1
    ih = F.least("by_a", "by_b") - F.greatest("ay_a", "ay_b") + 1
    return (
        cand.join(ca, "rid_a").join(cb, "rid_b")
        .withColumn("inter_area", F.greatest(iw, F.lit(0)) * F.greatest(ih, F.lit(0)))
        .where(F.col("inter_area") > 0)
        .select(
            F.col("rid_a").alias(f"{key}_a"),
            F.col("rid_b").alias(f"{key}_b"),
            "inter_area", "area_a", "area_b",
            (F.col("area_a") + F.col("area_b") - F.col("inter_area")).alias("union_area"),
            (
                F.col("inter_area").cast("double")
                / (F.col("area_a") + F.col("area_b") - F.col("inter_area"))
            ).alias("jaccard"),
        )
    )


def rect_overlap_pairs_sql(rects_cte: str, key: str = "region_id") -> str:
    """DuckDB oracle twin for :func:`rect_overlap_pairs` — a DIFFERENT
    algorithm: the brute all-pairs join with the inclusive-arithmetic
    overlap test directly in the predicate (no cells, no dedup). Binds
    ``ro_out``; select from it. Exact integer arithmetic both sides, so
    the only float (jaccard) is one division of identical BIGINTs."""
    return f"""
    ro_out AS (
      SELECT a.{key} AS {key}_a, b.{key} AS {key}_b,
             (LEAST(a.bx, b.bx) - GREATEST(a.ax, b.ax) + 1)
               * (LEAST(a.by, b.by) - GREATEST(a.ay, b.ay) + 1) AS inter_area,
             (a.bx - a.ax + 1) * (a.by - a.ay + 1) AS area_a,
             (b.bx - b.ax + 1) * (b.by - b.ay + 1) AS area_b,
             (a.bx - a.ax + 1) * (a.by - a.ay + 1)
               + (b.bx - b.ax + 1) * (b.by - b.ay + 1)
               - (LEAST(a.bx, b.bx) - GREATEST(a.ax, b.ax) + 1)
                 * (LEAST(a.by, b.by) - GREATEST(a.ay, b.ay) + 1) AS union_area,
             CAST((LEAST(a.bx, b.bx) - GREATEST(a.ax, b.ax) + 1)
                  * (LEAST(a.by, b.by) - GREATEST(a.ay, b.ay) + 1) AS DOUBLE)
               / ((a.bx - a.ax + 1) * (a.by - a.ay + 1)
                  + (b.bx - b.ax + 1) * (b.by - b.ay + 1)
                  - (LEAST(a.bx, b.bx) - GREATEST(a.ax, b.ax) + 1)
                    * (LEAST(a.by, b.by) - GREATEST(a.ay, b.ay) + 1)) AS jaccard
      FROM {rects_cte} a JOIN {rects_cte} b ON a.{key} < b.{key}
      WHERE LEAST(a.bx, b.bx) - GREATEST(a.ax, b.ax) + 1 > 0
        AND LEAST(a.by, b.by) - GREATEST(a.ay, b.ay) + 1 > 0
    )
    """


__all__ = [
    "rect_union_sweep",
    "rect_union_sweep_sql",
    "rect_overlap_pairs",
    "rect_overlap_pairs_sql",
]
