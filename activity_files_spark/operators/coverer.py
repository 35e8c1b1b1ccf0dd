"""Hierarchical region coverer: the minimal mixed-level quadtree
decomposition of a cell-aligned rectangle — the S2/H3 "region cover"
primitive that turns geofences into index range predicates.

Fixed-level polygon covers (operators/spatial.py) key every geofence to
one zoom; at corpus scale a LARGE fence then explodes into millions of
fine cells while a small one over-covers with coarse ones.  Real cell
indexes (S2RegionCoverer, H3 polyfill ladders) emit a MIXED-level cover:
coarse cells where the region is fat, fine cells along the boundary.
This module is that operator, fully relational.

Exactness design: regions are INTEGER cell ranges at the finest zoom
``z_max`` (inclusive ``[ax,bx] x [ay,by]``) — the same lattice snap every
hash-gated tiling query uses, so both engines subdivide identical
integers.  A level-``z`` cell covers the range
``[cx << (z_max-z), ((cx+1) << (z_max-z)) - 1]`` per axis; containment
and overlap are pure BIGINT comparisons.

Algorithm (unrolled BFS, one lazy plan — the fixed-round discipline of
operators/clustering.py): frontier starts at ``z0`` with the region's
bbox cells; at each level, cells fully inside the region are EMITTED,
cells merely overlapping subdivide into their 4 children (explode), and
the rest drop.  Because the region is cell-aligned at ``z_max``, every
frontier cell at ``z_max`` that overlaps is fully inside — the emitted
set is an EXACT disjoint partition of the region (tests pin both
disjointness and the 4^(z_max-z) area identity).

Scale shape: per-level cardinality is O(perimeter / cell_size) — the
classic quadtree boundary bound — so a corpus of fences decomposes with
no joins at all: explodes + filters, one map-side-combined rollup at the
end.  The emitted (level, cell) rows are exactly the range predicates an
Iceberg/S2 index scan would push down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def region_quad_cover(
    regions: DataFrame,
    z0: int,
    z_max: int,
    key: str = "region_id",
) -> DataFrame:
    """Mixed-level quadtree cover of cell-aligned rectangles.

    ``regions``: one row per region with BIGINT inclusive cell-range
    columns ``ax, ay, bx, by`` at zoom ``z_max`` (0 <= a <= b < 2**z_max)
    and an id column ``key``.

    Returns ``(key, level, cx, cy)`` — the unique disjoint mixed-level
    decomposition: every emitted cell is fully inside its region, no
    emitted cell's 3 siblings are all emitted at the same level (their
    parent would have been emitted instead), and the union is the region.
    """
    reg = regions.select(
        F.col(key).alias("key"), "ax", "ay", "bx", "by"
    )
    key_type = reg.schema["key"].dataType.simpleString()

    # r06: the previous fully-relational unrolled BFS chained one
    # explode+filter pair per level AND re-executed the frontier chain
    # once per emitted-level union branch (levels² stages of pure plan
    # latency for row counts bounded by the perimeter). The enumeration is
    # a per-region pure-integer walk, so run the tested python twin inside
    # one Arrow pass — regions stream through the kernel, per-region work
    # is the same O(perimeter) the relational form did, and the SQL oracle
    # still replays the level-by-level subdivision relationally.
    def kern(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for kv, ax, ay, bx, by in zip(
                pdf["key"].tolist(), pdf["ax"].tolist(), pdf["ay"].tolist(),
                pdf["bx"].tolist(), pdf["by"].tolist(),
            ):
                for z, cx, cy in region_quad_cover_py(
                    int(ax), int(ay), int(bx), int(by), z0, z_max
                ):
                    rows.append((kv, z, cx, cy))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["key", "level", "cx", "cy"]
                )

    return reg.mapInPandas(
        kern, f"key {key_type}, level int, cx long, cy long"
    )


def region_quad_cover_py(
    ax: int, ay: int, bx: int, by: int, z0: int, z_max: int
) -> set[tuple[int, int, int]]:
    """Pure-python twin (tests): returns {(level, cx, cy)}."""
    out: set[tuple[int, int, int]] = set()
    sh0 = z_max - z0
    frontier = [
        (cx, cy)
        for cx in range(ax >> sh0, (bx >> sh0) + 1)
        for cy in range(ay >> sh0, (by >> sh0) + 1)
    ]
    for z in range(z0, z_max + 1):
        sh = z_max - z
        nxt = []
        for cx, cy in frontier:
            lox, hix = cx << sh, ((cx + 1) << sh) - 1
            loy, hiy = cy << sh, ((cy + 1) << sh) - 1
            if lox >= ax and hix <= bx and loy >= ay and hiy <= by:
                out.add((z, cx, cy))
            elif lox <= bx and hix >= ax and loy <= by and hiy >= ay:
                if z < z_max:
                    nxt += [
                        (2 * cx, 2 * cy),
                        (2 * cx + 1, 2 * cy),
                        (2 * cx, 2 * cy + 1),
                        (2 * cx + 1, 2 * cy + 1),
                    ]
        frontier = nxt
    return out


def region_quad_cover_sql(
    regions_cte: str, z0: int, z_max: int, key: str = "region_id"
) -> tuple[str, str]:
    """DuckDB twin: same unrolled subdivision as numbered CTEs.

    ``regions_cte`` must expose (key-col, ax, ay, bx, by).  Returns
    (cte_body, final_name); final has (key, level, cx, cy)."""
    sh0 = z_max - z0
    ctes = [
        f"""qf{z0} AS (
      SELECT {key} AS key, ax, ay, bx, by, gx.cx AS cx, gy.cy AS cy
      FROM {regions_cte},
           LATERAL (SELECT unnest(generate_series(ax // {1 << sh0},
                                                  bx // {1 << sh0})) AS cx) gx,
           LATERAL (SELECT unnest(generate_series(ay // {1 << sh0},
                                                  by // {1 << sh0})) AS cy) gy
    )"""
    ]
    emits = []
    for z in range(z0, z_max + 1):
        sh = z_max - z
        s = 1 << sh
        inside = (
            f"(cx*{s} >= ax AND (cx+1)*{s}-1 <= bx AND "
            f"cy*{s} >= ay AND (cy+1)*{s}-1 <= by)"
        )
        overlap = (
            f"(cx*{s} <= bx AND (cx+1)*{s}-1 >= ax AND "
            f"cy*{s} <= by AND (cy+1)*{s}-1 >= ay)"
        )
        emits.append(
            f"SELECT key, {z} AS level, cx, cy FROM qf{z} WHERE {inside}"
        )
        if z == z_max:
            break
        ctes.append(
            f"""qf{z + 1} AS (
      SELECT key, ax, ay, bx, by,
             2*cx + dx.d AS cx, 2*cy + dy.d AS cy
      FROM qf{z},
           (SELECT unnest([0, 1]) AS d) dx,
           (SELECT unnest([0, 1]) AS d) dy
      WHERE {overlap} AND NOT {inside}
    )"""
        )
    body = ",\n    ".join(ctes)
    final = "(" + " UNION ALL ".join(emits) + ")"
    return body, final
