"""Hysteresis elevation gain/loss: the standard total-ascent/descent
reckoning over a noisy elevation stream. The reference carries the device's
pre-computed ``total_ascent`` FIT session field verbatim (models.dart:629,
session summary surface); this operator RE-DERIVES it from trackpoints the
way barometric head units do — a reference-elevation walk with a dead band:

    ref = first elevation; ascent = descent = 0
    for each point (in time order):
        if ele >= ref + threshold: ascent += ele - ref; ref = ele
        elif ele <= ref - threshold: descent += ref - ele; ref = ele
        (otherwise ref holds -- the dead band swallows sub-threshold noise)

The dead band makes the walk genuinely sequential (each step's branch
depends on the reckoned ``ref``, which any future point may reset), so like
the repo's distance-downsample keep-chain this is an `applyInPandas` kernel
partitioned on the natural key — NOT window-expressible. Group sizes are
per-activity/per-user point counts (bounded by the payload caps), so the
per-group Python walk is O(points) with no driver-side work; the shuffle is
the one hash exchange on the key.

The DuckDB oracle twin replays the walk as a recursive CTE stepping one
row-number at a time — a different evaluation engine over the same exact
float sequence (both accumulate left-to-right doubles), so sums are
bit-identical and the driver hash-gates them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from activity_files_spark.operators.grouped import grouped_apply


def _walk(ele: np.ndarray, threshold: float) -> tuple[float, float, float]:
    ref = float(ele[0])
    asc = 0.0
    desc = 0.0
    for e in ele[1:]:
        e = float(e)
        if e >= ref + threshold:
            asc += e - ref
            ref = e
        elif e <= ref - threshold:
            desc += ref - e
            ref = e
    return asc, desc, ref


def elevation_gain(
    points: DataFrame,
    threshold_m: float,
    key: str = "user_id",
    order: str = "event_id",
    ele: str = "ele",
) -> DataFrame:
    """Per-``key`` hysteresis totals: ``n_points``, ``ascent_m``,
    ``descent_m``, ``final_ref_m`` (the reckoned reference elevation after
    the walk). Points are ordered by ``order`` inside each group."""
    schema = (
        f"`{key}` long, n_points long, ascent_m double, "
        "descent_m double, final_ref_m double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="stable")
        e = pdf[ele].to_numpy(dtype="float64")
        asc, desc, ref = _walk(e, threshold_m)
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n_points": [len(e)],
                "ascent_m": [asc],
                "descent_m": [desc],
                "final_ref_m": [ref],
            }
        )

    return grouped_apply(points, key, kernel, schema)


def elevation_gain_sql(
    pts_cte: str,
    threshold_m: float,
    key: str = "user_id",
    order: str = "event_id",
    ele: str = "ele",
) -> str:
    """Recursive-CTE oracle twin (DuckDB). Binds ``eg_idx`` / ``eg_walk`` /
    ``eg_out``; select from ``eg_out``. The walk steps per-key row numbers
    in lockstep; ascent/descent are non-decreasing so the final row is the
    MAX. Must be composed under ``WITH RECURSIVE``."""
    t = f"CAST({float(threshold_m)!r} AS DOUBLE)"
    return f"""
    eg_idx AS (
      SELECT {key} AS k,
             row_number() OVER (PARTITION BY {key} ORDER BY {order}) AS i,
             {ele} AS e
      FROM {pts_cte}
    ),
    eg_walk(k, i, ref, a_m, d_m) AS (
      SELECT k, i, e, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
      FROM eg_idx WHERE i = 1
      UNION ALL
      SELECT p.k, p.i,
             CASE WHEN p.e >= w.ref + {t} OR p.e <= w.ref - {t}
                  THEN p.e ELSE w.ref END,
             w.a_m + CASE WHEN p.e >= w.ref + {t} THEN p.e - w.ref ELSE 0.0 END,
             w.d_m + CASE WHEN p.e <= w.ref - {t} THEN w.ref - p.e ELSE 0.0 END
      FROM eg_walk w JOIN eg_idx p ON p.k = w.k AND p.i = w.i + 1
    ),
    eg_out AS (
      SELECT k AS {key}, MAX(i) AS n_points, MAX(a_m) AS ascent_m,
             MAX(d_m) AS descent_m,
             arg_max(ref, i) AS final_ref_m
      FROM eg_walk GROUP BY k
    )
    """


__all__ = ["elevation_gain", "elevation_gain_sql"]
