"""Common record-stream schema shared by all format parsers.

Each parser turns one file into a flat stream of typed records (a
discriminated union over `kind`), exploded inside a mapInPandas Arrow
kernel — one file per iteration, whole-batch output, no per-row Python at
the Spark boundary. Splitting the stream into points/channels/laps tables
is then a plain filter (cache the records DF when extracting several).

kinds:
  point       -> seq, ts, lat, lon, ele, attrs (attrs may carry a preserved
                 extensions_json tree for lossless GPX round-trips)
  channel     -> channel, ts, value
  lap         -> lap_id, start_ts, end_ts, distance_m, sport, stats(json attrs)
  waypoint    -> seq, ts, lat, lon, ele, attrs(name/desc/sym)
  route       -> lap_id (route index), attrs(name/desc/extensions_json) —
                 GPX <rte> planned geometry (gpx_parser.dart:364-403)
  route_point -> lap_id (route index), seq, ts, lat, lon, ele, attrs
  length      -> start_ts, end_ts, attrs (swim lengths, FIT msg 101)
  set         -> start_ts, end_ts, attrs (strength sets, FIT msg 225)
  meta        -> attrs (string key/value metadata, incl. sport/device/creator)
  diag        -> attrs{code, severity, message} (parsers never throw on
                 malformed data — reference parse_result.dart:69-100)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RECORD_SCHEMA = (
    "activity_id string, kind string, seq long, ts timestamp, "
    "lat double, lon double, ele double, channel string, value double, "
    "lap_id int, start_ts timestamp, end_ts timestamp, distance_m double, "
    "sport string, attrs map<string,string>"
)

RECORD_FIELDS = [
    "activity_id", "kind", "seq", "ts", "lat", "lon", "ele", "channel",
    "value", "lap_id", "start_ts", "end_ts", "distance_m", "sport", "attrs",
]


def records_frame(rows: list[dict]) -> pd.DataFrame:
    """Normalize a list of partial record dicts to the full schema."""
    return normalize_records(pd.DataFrame(rows, columns=RECORD_FIELDS))


def normalize_records(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize a partial-column pandas frame to the full record schema
    (missing columns added as nulls, dtypes coerced). Lets vectorized
    parsers build whole column frames instead of per-row dicts."""
    for c in RECORD_FIELDS:
        if c not in df.columns:
            df[c] = None
    df = df[RECORD_FIELDS]
    for c in ("ts", "start_ts", "end_ts"):
        df[c] = pd.to_datetime(df[c], utc=True).dt.tz_localize(None)
    for c in ("lat", "lon", "ele", "value", "distance_m"):
        df[c] = pd.to_numeric(df[c], errors="coerce")
    df["seq"] = df["seq"].astype("Int64")
    df["lap_id"] = df["lap_id"].astype("Int32")
    # object columns: pandas fills missing cells with NaN floats, which Arrow
    # rejects for map/string types — normalize to None
    df["attrs"] = df["attrs"].apply(lambda v: v if isinstance(v, dict) else None)
    for c in ("activity_id", "kind", "channel", "sport"):
        df[c] = df[c].apply(lambda v: v if isinstance(v, str) else None)
    return df


def fast_records(pdf: pd.DataFrame, cols: list[str]) -> list[dict]:
    """list-of-dicts over selected columns via vectorized Series.tolist() —
    ~10x pandas to_dict('records')/itertuples on small mixed-dtype frames
    (those materialize every cell through per-row indexing). datetime64
    cells come back as pd.Timestamp/NaT, numeric NaN as float('nan') —
    the same cell values to_dict('records') produces."""
    data = [pdf[c].tolist() for c in cols]
    return [dict(zip(cols, vals)) for vals in zip(*data)]


def points_of(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "point").select(
        "activity_id", "seq", "ts", "lat", "lon", "ele", "attrs"
    )


def channels_of(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "channel").select(
        "activity_id", "channel", "ts", "value"
    )


def laps_of(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "lap").select(
        "activity_id", "lap_id", "start_ts", "end_ts", "distance_m", "sport", "attrs"
    )


def waypoints_of(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "waypoint").select(
        "activity_id", "seq", "ts", "lat", "lon", "ele", "attrs"
    )


def routes_of(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "route").select(
        "activity_id", F.col("lap_id").alias("route_id"), "attrs"
    )


def route_points_of(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "route_point").select(
        "activity_id", F.col("lap_id").alias("route_id"), "seq", "ts",
        "lat", "lon", "ele", "attrs"
    )


def meta_of(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "meta").select("activity_id", "attrs")


def diagnostics_of(records: DataFrame) -> DataFrame:
    return records.filter(F.col("kind") == "diag").select("activity_id", "attrs")
