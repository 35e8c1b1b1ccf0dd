"""Segment supercover: every z-tile a trajectory SEGMENT passes through.

Point tiling (functions/quadkey.py, operators/tiling.py) keys each sample
to one cell; a sparsely-sampled track skips cells between samples.  Route
indexing at corpus scale wants the cells the LINE crosses — the polyline
twin of tile assignment, and the write path for "which tiles does this
route touch" inverted indexes.

Exactness design (the repo's cross-engine discipline):

1. Endpoints are snapped to an integer subcell lattice with ``2**q``
   subunits per cell — the same floor-of-web-mercator transform the
   hash-gated quadkey/rasterize queries already share
   (functions/quadkey.py ``tile_xy_*`` at pixel-zoom ``z+q``).  Snapping
   moves an endpoint by at most ``2**-q`` of a cell, the same cell-snap
   semantics as the Hausdorff refine in operators/trajectory.py.
2. Everything after the snap is PURE INTEGER arithmetic: the cover is
   enumerated as boundary crossings of the lattice line, with an explicit
   floor-division twin (``_fdiv``) built from ``%`` (truncating with the
   dividend's sign in BOTH Spark and DuckDB), so the oracle replays every
   cell bit-for-bit — no floats, no trig, no tolerance.

Cover definition (supercover, closed boxes): a cell is covered iff the
closed segment intersects the cell's CLOSED unit box.  Equivalently the
emitted set is

- the endpoint cells — an endpoint ON a cell boundary belongs to the
  closed boxes on BOTH sides (4 at a lattice corner), so each endpoint
  emits the {floor, floor-1 if on-boundary} cross product per axis, plus
- for every vertical grid line the segment crosses, the two cells left and
  right of the crossing at its row — and, when the crossing lands exactly
  on a lattice corner, the row below as well (4 corner cells, supercover
  semantics), plus
- the mirrored set for horizontal grid lines.

Direction is canonicalized per axis (x-sorted endpoints for vertical
crossings, y-sorted for horizontal) so all divisions have positive
denominators; a zero-extent axis contributes no crossings.  Tests pin the
enumeration against a brute closed-box / segment intersection oracle in
exact integer arithmetic.

Scale shape (r06): one lag window per route (the shuffle every per-track
op pays), then ONE vectorized int64 Arrow pass (``segment_cover_rows``)
emits the whole enumeration — output cardinality is the cover itself
(bounded by the segment's length in cells, the quantity any tiling
writer must materialize anyway), no joins, no per-branch re-scans,
groupBy rollups map-side combined.

The reference engine has no spatial indexing at all (per-file track
parser, SURVEY §2); this operator is north-rule spatial core built fresh.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fdiv(a: Column, b: Column) -> Column:
    """Floor division for BIGINT columns, exact for negative dividends;
    ``b`` must be positive. Spark's ``%`` truncates toward zero with the
    dividend's sign (same as DuckDB), so ``((a % b) + b) % b`` is the
    non-negative remainder in both engines.

    The quotient routes through a double division (Spark has no Column
    integer-div), which is exact only while ``|a| < 2**53`` — hence the
    26-bit coordinate bound documented on :func:`segment_cell_cover`
    (crossing numerators are products of two coordinates)."""
    pm = ((a % b) + b) % b
    return (a - pm) / b


def _fdiv_sql(a: str, b: str) -> str:
    return f"((({a}) - (((({a}) % ({b})) + ({b})) % ({b}))) // ({b}))"


def _cover_cells_np(x0, y0, x1, y1, q: int):
    """Vectorized (numpy int64) supercover enumeration for a batch of
    segments — the exact integer walk of :func:`segment_cell_cover_py`,
    batched: returns ``(idx, cx, cy)`` where ``idx`` indexes the input
    segment each cell belongs to, deduped per segment.

    Everything is int64: numpy ``//``/``%`` are floor-division twins of the
    ``_fdiv`` discipline (floor toward -inf, remainder with the divisor's
    sign), and the crossing numerators are products of two <=26-bit
    coordinates — exact with headroom."""
    import numpy as np

    s = np.int64(1 << q)
    n = len(x0)
    idx_all, cx_all, cy_all = [], [], []
    base = np.arange(n, dtype=np.int64)

    def emit(i, a, b):
        idx_all.append(i)
        cx_all.append(a)
        cy_all.append(b)

    # endpoint cells: floor cell, plus the closed boxes on the other side
    # of any boundary the endpoint lies on (4 at a lattice corner)
    for x, y in ((x0, y0), (x1, y1)):
        ex = x // s
        ey = y // s
        bx = (x % s) == 0
        by = (y % s) == 0
        emit(base, ex, ey)
        if bx.any():
            emit(base[bx], ex[bx] - 1, ey[bx])
        if by.any():
            emit(base[by], ex[by], ey[by] - 1)
        both = bx & by
        if both.any():
            emit(base[both], ex[both] - 1, ey[both] - 1)

    def axis(a0x, a0y, a1x, a1y, swap: bool) -> None:
        # canonicalize so the crossing axis increases
        fwd = a0x <= a1x
        px = np.where(fwd, a0x, a1x)
        py = np.where(fwd, a0y, a1y)
        qx = np.where(fwd, a1x, a0x)
        qy = np.where(fwd, a1y, a0y)
        cnt = np.maximum(qx // s - px // s, 0)
        tot = int(cnt.sum())
        if tot == 0:
            return
        idx = np.repeat(base, cnt)
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        k = np.arange(tot, dtype=np.int64) - np.repeat(starts, cnt)
        cb = (px // s)[idx] + 1 + k
        dx = (qx - px)[idx]
        dy = (qy - py)[idx]
        # crossing of boundary x = cb*s:
        # row = floor((py*dx + dy*(cb*s - px)) / (dx*s))
        num = py[idx] * dx + dy * (cb * s - px[idx])
        den = dx * s  # > 0 wherever cnt > 0
        row = num // den
        corner = (num % den) == 0
        a_side = np.concatenate([cb - 1, cb])
        b_side = np.concatenate([row, row])
        i_side = np.concatenate([idx, idx])
        if corner.any():
            a_side = np.concatenate([a_side, cb[corner] - 1, cb[corner]])
            b_side = np.concatenate([b_side, row[corner] - 1, row[corner] - 1])
            i_side = np.concatenate([i_side, idx[corner], idx[corner]])
        if swap:
            a_side, b_side = b_side, a_side
        emit(i_side, a_side, b_side)

    axis(x0, y0, x1, y1, swap=False)
    axis(y0, x0, y1, x1, swap=True)

    idx = np.concatenate(idx_all)
    cx = np.concatenate(cx_all)
    cy = np.concatenate(cy_all)
    # dedup per segment (lexsort + neighbor-diff mask)
    order = np.lexsort((cy, cx, idx))
    idx, cx, cy = idx[order], cx[order], cy[order]
    keep = np.empty(len(idx), dtype=bool)
    keep[:1] = True
    keep[1:] = (
        (idx[1:] != idx[:-1]) | (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])
    )
    return idx[keep], cx[keep], cy[keep]


def segment_cover_rows(
    segments: DataFrame, q: int, carry: list[str] | tuple[str, ...]
) -> DataFrame:
    """Exploded supercover in ONE Arrow pass (mapInPandas + the vectorized
    int64 kernel): input rows expose BIGINT subcell endpoints
    ``x0, y0, x1, y1`` plus the ``carry`` columns; output is one row per
    (input row, covered cell) — ``carry..., cx, cy`` — deduped per input
    row. Replaces the previous three-branch union (endpoints + vertical +
    horizontal crossings), which re-ran the upstream scan/window per branch
    and needed a join-back to recover segment attributes (r06)."""
    import numpy as np

    carry = list(carry)
    in_cols = list(dict.fromkeys(carry + ["x0", "y0", "x1", "y1"]))
    src = segments.select(*in_cols)
    types = {f.name: f.dataType.simpleString() for f in src.schema.fields}
    schema = ", ".join(
        [f"`{c}` {types[c]}" for c in carry] + ["cx long", "cy long"]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            idx, cx, cy = _cover_cells_np(
                pdf["x0"].to_numpy(np.int64),
                pdf["y0"].to_numpy(np.int64),
                pdf["x1"].to_numpy(np.int64),
                pdf["y1"].to_numpy(np.int64),
                q,
            )
            out = {c: pdf[c].to_numpy()[idx] for c in carry}
            out["cx"] = cx
            out["cy"] = cy
            yield pd.DataFrame(out)

    return src.mapInPandas(kernel, schema)


def segment_cell_cover(
    segments: DataFrame,
    q: int = 8,
    key: str = "key",
) -> DataFrame:
    """Distinct (key, cx, cy) cells covered by each segment group.

    ``segments``: one row per segment with BIGINT subcell-lattice endpoint
    columns ``x0, y0, x1, y1`` (``2**q`` subunits per cell) and a grouping
    column ``key`` (cells are deduped per key, not per segment — a route's
    cover is a set).

    Coordinate bound: endpoints must fit in 26 bits (cell zoom + q <= 26,
    e.g. z18 tiles with 2^8 subcells — sub-meter snap), because the
    crossing numerators multiply two coordinates and the quotient passes
    through a double division that is exact only below 2**53. Both engine
    twins share the bound; the z14+q8 driver tier uses 22 bits.
    """
    seg = segments.select(
        F.col(key).alias("key"), "x0", "y0", "x1", "y1"
    )
    return segment_cover_rows(seg, q, ["key"]).dropDuplicates(
        ["key", "cx", "cy"]
    )


def segment_cell_cover_py(
    x0: int, y0: int, x1: int, y1: int, q: int = 8
) -> set[tuple[int, int]]:
    """Pure-python golden twin of the enumeration (same crossings walk)."""
    s = 1 << q
    cells: set[tuple[int, int]] = set()
    for x, y in ((x0, y0), (x1, y1)):
        exs = [x // s] + ([x // s - 1] if x % s == 0 else [])
        eys = [y // s] + ([y // s - 1] if y % s == 0 else [])
        for a in exs:
            for b in eys:
                cells.add((a, b))

    def axis(px: int, py: int, qx: int, qy: int, swap: bool) -> None:
        if px > qx:
            px, py, qx, qy = qx, qy, px, py
        if px == qx:
            return
        dx, dy = qx - px, qy - py
        den = dx * s
        for cb in range(px // s + 1, qx // s + 1):
            num = py * dx + dy * (cb * s - px)
            row = num // den
            pairs = [(cb - 1, row), (cb, row)]
            if num % den == 0:
                pairs += [(cb - 1, row - 1), (cb, row - 1)]
            for a, b in pairs:
                cells.add((a, b) if not swap else (b, a))

    axis(x0, y0, x1, y1, swap=False)
    axis(y0, x0, y1, x1, swap=True)
    return cells


def brute_cover_py(
    x0: int, y0: int, x1: int, y1: int, q: int = 8
) -> set[tuple[int, int]]:
    """Definitional oracle: closed-box / closed-segment intersection test in
    exact integer arithmetic over the segment's cell bbox (tests only)."""
    s = 1 << q
    out: set[tuple[int, int]] = set()

    def seg_box(cx: int, cy: int) -> bool:
        bx0, by0, bx1, by1 = cx * s, cy * s, (cx + 1) * s, (cy + 1) * s
        # bbox reject
        if max(x0, x1) < bx0 or min(x0, x1) > bx1:
            return False
        if max(y0, y1) < by0 or min(y0, y1) > by1:
            return False
        # separating line through the segment: all 4 corners strictly one side
        dx, dy = x1 - x0, y1 - y0
        if dx == 0 and dy == 0:
            return True  # point inside bbox (checked above)
        signs = [
            dx * (cy_ - y0) - dy * (cx_ - x0)
            for cx_, cy_ in (
                (bx0, by0),
                (bx1, by0),
                (bx0, by1),
                (bx1, by1),
            )
        ]
        return not (all(v > 0 for v in signs) or all(v < 0 for v in signs))

    # scan one cell beyond the floor bbox on every side: a boundary-lying
    # segment touches closed boxes whose floor cell is outside the bbox
    for cx in range(min(x0, x1) // s - 1, max(x0, x1) // s + 2):
        for cy in range(min(y0, y1) // s - 1, max(y0, y1) // s + 2):
            if seg_box(cx, cy):
                out.add((cx, cy))
    return out


# --------------------------------------------------------------------- SQL
def segment_cover_sql(
    seg_cte: str, q: int, key: str = "key", prefix: str = "sc"
) -> tuple[str, str]:
    """DuckDB CTE fragment replaying the enumeration bit-for-bit over a CTE
    ``seg_cte`` exposing ``{key}, x0, y0, x1, y1`` (BIGINT subcell coords).

    Returns ``(cte_sql, final_name)``; the final CTE exposes
    ``{key}, cx, cy`` (distinct)."""
    s = 1 << q
    p = prefix

    def axis(name: str, ax0: str, ay0: str, ax1: str, ay1: str, swap: bool) -> str:
        # canonicalize: crossing axis increases
        canon = (
            f"{p}_{name}_c AS (SELECT {key}, "
            f"CASE WHEN {ax0} <= {ax1} THEN {ax0} ELSE {ax1} END AS px, "
            f"CASE WHEN {ax0} <= {ax1} THEN {ay0} ELSE {ay1} END AS py, "
            f"CASE WHEN {ax0} <= {ax1} THEN {ax1} ELSE {ax0} END AS qx, "
            f"CASE WHEN {ax0} <= {ax1} THEN {ay1} ELSE {ay0} END AS qy "
            f"FROM {seg_cte} WHERE "
            f"(CASE WHEN {ax0} <= {ax1} THEN {ax0} ELSE {ax1} END) < "
            f"(CASE WHEN {ax0} <= {ax1} THEN {ax1} ELSE {ax0} END))"
        )
        fd_p = _fdiv_sql("px", str(s))
        fd_q = _fdiv_sql("qx", str(s))
        num = f"(py * (qx - px) + (qy - py) * (cb * {s} - px))"
        den = f"((qx - px) * {s})"
        row = _fdiv_sql(num, den)
        rem = f"((({num}) % ({den})) + ({den})) % ({den})"
        expl = (
            f"{p}_{name}_x AS (SELECT {key}, cb, {row} AS row, ({rem}) = 0 AS corner "
            f"FROM (SELECT {key}, px, py, qx, qy, UNNEST(range({fd_p} + 1, {fd_q} + 1)) AS cb "
            f"FROM {p}_{name}_c) t)"
        )
        a, b = ("u.a", "u.b")
        cx, cy = (a, b) if not swap else (b, a)
        sides = (
            f"{p}_{name} AS (SELECT {key}, {cx} AS cx, {cy} AS cy FROM ("
            f"SELECT {key}, UNNEST(CASE WHEN corner THEN ["
            f"{{'a': cb - 1, 'b': row}}, {{'a': cb, 'b': row}}, "
            f"{{'a': cb - 1, 'b': row - 1}}, {{'a': cb, 'b': row - 1}}] ELSE ["
            f"{{'a': cb - 1, 'b': row}}, {{'a': cb, 'b': row}}] END) AS u "
            f"FROM {p}_{name}_x) t)"
        )
        return ",\n    ".join([canon, expl, sides])

    exd = _fdiv_sql("u.x", str(s))
    eyd = _fdiv_sql("u.y", str(s))
    ex2 = f"({exd} - CASE WHEN (u.x % {s}) = 0 THEN 1 ELSE 0 END)"
    ey2 = f"({eyd} - CASE WHEN (u.y % {s}) = 0 THEN 1 ELSE 0 END)"
    ep = (
        f"{p}_ep AS (SELECT {key}, c.a AS cx, c.b AS cy FROM ("
        f"SELECT {key}, UNNEST(["
        f"{{'a': {exd}, 'b': {eyd}}}, {{'a': {ex2}, 'b': {eyd}}}, "
        f"{{'a': {exd}, 'b': {ey2}}}, {{'a': {ex2}, 'b': {ey2}}}]) AS c FROM ("
        f"SELECT {key}, UNNEST([{{'x': x0, 'y': y0}}, {{'x': x1, 'y': y1}}]) AS u "
        f"FROM {seg_cte}) t) t2)"
    )
    vert = axis("v", "x0", "y0", "x1", "y1", swap=False)
    horiz = axis("h", "y0", "x0", "y1", "x1", swap=True)
    final = f"{p}_cover"
    un = (
        f"{final} AS (SELECT DISTINCT {key}, cx, cy FROM ("
        f"SELECT * FROM {p}_ep UNION ALL SELECT * FROM {p}_v "
        f"UNION ALL SELECT * FROM {p}_h) t)"
    )
    return ",\n    ".join([ep, vert, horiz, un]), final
