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
    points: DataFrame, step_s: float, key: str = "activity_id", ts: str = "ts"
) -> DataFrame:
    """W7: stateful time downsampling per activity."""
    schema = points.schema

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts, kind="stable")
        t = pdf[ts].values.astype("datetime64[us]").astype("int64") / 1e6
        return pdf[_keep_by_time(t, step_s)]

    return points.groupBy(key).applyInPandas(lambda _k, pdf: kernel(pdf), schema)


def downsample_distance(
    points: DataFrame, meters: float, key: str = "activity_id", ts: str = "ts"
) -> DataFrame:
    """W8: stateful distance downsampling per activity."""
    schema = points.schema

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts, kind="stable")
        return pdf[_keep_by_distance(pdf["lat"].values, pdf["lon"].values, meters)]

    return points.groupBy(key).applyInPandas(lambda _k, pdf: kernel(pdf), schema)
