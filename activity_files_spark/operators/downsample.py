"""Stateful downsampling (W7/W8) + pause edits — the reference operators
whose keep/drop decision depends on the last KEPT row, so they are not
window-expressible (raw_editor.dart:506-613). State never crosses an
activity boundary, so each runs as an applyInPandas kernel over the
activity key — one vectorized pass per activity, numpy inside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from activity_files_spark.functions.geo import haversine_m_py
from activity_files_spark.operators.grouped import grouped_apply


def _keep_by_time(ts_s: np.ndarray, step_s: float) -> np.ndarray:
    """Keep a row if >= step_s since the last kept; always keep the final
    point (raw_editor.dart:506-570)."""
    n = len(ts_s)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = True
    last = ts_s[0]
    for i in range(1, n):
        if ts_s[i] - last >= step_s:
            keep[i] = True
            last = ts_s[i]
    keep[-1] = True
    return keep


def _keep_by_distance(lat: np.ndarray, lon: np.ndarray, meters: float) -> np.ndarray:
    """Keep a row if haversine from the last kept >= meters
    (raw_editor.dart:573-613)."""
    n = len(lat)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = True
    li, lo = lat[0], lon[0]
    for i in range(1, n):
        if haversine_m_py(li, lo, lat[i], lon[i]) >= meters:
            keep[i] = True
            li, lo = lat[i], lon[i]
    keep[-1] = True
    return keep


def downsample_time(
    points: DataFrame,
    step_s: float,
    key: str = "activity_id",
    ts: str = "ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W7: stateful time downsampling per activity.

    ``tiebreak``: extra sort columns after ``ts`` — on data with duplicate
    (key, ts) a ts-only stable sort inherits nondeterministic shuffle order,
    making the keep chain (and any exact oracle) nondeterministic; pass a
    unique column (mirrors stream_downsample_time)."""
    schema = points.schema
    order = [ts] + list(tiebreak or [])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="stable")
        t = pdf[ts].values.astype("datetime64[us]").astype("int64") / 1e6
        return pdf[_keep_by_time(t, step_s)]

    return grouped_apply(points, key, kernel, schema)


def downsample_distance(
    points: DataFrame,
    meters: float,
    key: str = "activity_id",
    ts: str = "ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W8: stateful distance downsampling per activity. ``tiebreak`` as in
    :func:`downsample_time` (determinism on tied timestamps)."""
    schema = points.schema
    order = [ts] + list(tiebreak or [])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="stable")
        return pdf[_keep_by_distance(pdf["lat"].values, pdf["lon"].values, meters)]

    return grouped_apply(points, key, kernel, schema)


# -------------------------------------------------- channel grid snapping

def _us(col: pd.Series) -> np.ndarray:
    return col.values.astype("datetime64[us]").astype("int64")


def _nearest_retained(ret_us: np.ndarray, t_us: np.ndarray, prefer_lower: bool):
    """Index of the nearest retained time for each t (ties -> lower retained
    index for the time path, upper for the distance path, matching the
    reference cursor walks)."""
    idx = np.searchsorted(ret_us, t_us, side="left")
    idx = np.clip(idx, 0, len(ret_us) - 1)
    lower = np.clip(idx - 1, 0, len(ret_us) - 1)
    d_up = np.abs(ret_us[idx] - t_us)
    d_lo = np.abs(t_us - ret_us[lower])
    if prefer_lower:
        use_lower = (idx > 0) & (d_lo <= d_up)
    else:
        use_lower = (idx > 0) & (d_lo < d_up)
    return np.where(use_lower, lower, idx)


def downsample_time_channels(
    points: DataFrame,
    channels: DataFrame,
    step_s: float,
    key: str = "activity_id",
    ts: str = "ts",
    channel_col: str = "channel",
    value: str = "value",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W7 channel half: keep each channel sample (at its own timestamp) iff
    its nearest retained point time is within max(1us, step/2) — the
    reference's closestIndex cursor + tolerance gate
    (raw_editor.dart:529-563). Cogrouped Arrow kernel per activity.
    ``tiebreak``: extra point-sort columns (determinism on tied ts)."""
    tol_us = max(1, int(step_s * 1_000_000) // 2)
    out_cols = [key, channel_col, ts, value]
    order = [ts] + list(tiebreak or [])
    schema = f"`{key}` string, `{channel_col}` string, `{ts}` timestamp, `{value}` double"

    def kernel(pts: pd.DataFrame, ch: pd.DataFrame) -> pd.DataFrame:
        if len(pts) == 0 or len(ch) == 0:
            return pd.DataFrame(columns=out_cols)
        pts = pts.sort_values(order, kind="stable")
        t = _us(pts[ts]).astype("float64") / 1e6
        ret_us = _us(pts[ts])[_keep_by_time(t, step_s)]
        ch = ch.sort_values(ts, kind="stable")
        s_us = _us(ch[ts])
        near = _nearest_retained(ret_us, s_us, prefer_lower=True)
        ok = np.abs(ret_us[near] - s_us) <= tol_us
        return ch[ok][out_cols]

    return points.groupBy(key).cogroup(channels.groupBy(key)).applyInPandas(
        lambda p, c: kernel(p, c), schema
    )


def _adaptive_snap_tol_us(ret_us: np.ndarray) -> int:
    """transform_utils.dart:74-93: half the average retained spacing,
    clamped to [200ms, 10s]; 1s for <2 points, 500ms for nonpositive span."""
    if len(ret_us) < 2:
        return 1_000_000
    total = int(ret_us[-1] - ret_us[0])
    if total <= 0:
        return 500_000
    half = max(1, (total // (len(ret_us) - 1)) // 2)
    return int(min(max(half, 200_000), 10_000_000))


def downsample_distance_channels(
    points: DataFrame,
    channels: DataFrame,
    meters: float,
    key: str = "activity_id",
    ts: str = "ts",
    channel_col: str = "channel",
    value: str = "value",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W8 channel half: nearest-sample resample ONTO the retained point
    grid — one output sample per (channel, retained time) whose nearest
    input sample lies within the adaptive tolerance; the output timestamp
    is the retained grid time (transform_utils.dart:95-140 _resampleNearest
    via raw_editor.dart:595-608). ``tiebreak``: extra point-sort columns
    (determinism on tied ts)."""

    out_cols = [key, channel_col, ts, value]
    order = [ts] + list(tiebreak or [])
    schema = f"`{key}` string, `{channel_col}` string, `{ts}` timestamp, `{value}` double"

    def kernel(pts: pd.DataFrame, ch: pd.DataFrame) -> pd.DataFrame:
        if len(pts) == 0 or len(ch) == 0:
            return pd.DataFrame(columns=out_cols)
        pts = pts.sort_values(order, kind="stable")
        keep = _keep_by_distance(pts["lat"].values, pts["lon"].values, meters)
        ret_us = _us(pts[ts])[keep]
        tol_us = _adaptive_snap_tol_us(ret_us)
        aid = pts[key].iloc[0]
        frames = []
        for cname, grp in ch.groupby(channel_col, sort=True):
            grp = grp.sort_values(ts, kind="stable")
            s_us = _us(grp[ts])
            # nearest input sample for each retained time (ties -> the
            # later/>= sample, matching _resampleNearest's consider order)
            idx = _nearest_retained(s_us, ret_us, prefer_lower=False)
            ok = np.abs(s_us[idx] - ret_us) <= tol_us
            if not ok.any():
                continue
            frames.append(pd.DataFrame({
                key: aid,
                channel_col: cname,
                ts: pd.to_datetime(ret_us[ok], unit="us"),
                value: grp[value].values[idx[ok]],
            }))
        if not frames:
            return pd.DataFrame(columns=out_cols)
        return pd.concat(frames, ignore_index=True)

    return points.groupBy(key).cogroup(channels.groupBy(key)).applyInPandas(
        lambda p, c: kernel(p, c), schema
    )
