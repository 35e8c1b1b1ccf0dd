"""Normalization operators — the reference's RawEditor semantics as lazy
DataFrame stages (reference: lib/src/transforms/raw_editor.dart).

Every function takes and returns a DataFrame; nothing materializes until the
sink. All of these are pure Column expressions + window functions — no Python
UDFs — so they stay inside whole-stage codegen and scale linearly with
partition count.

Trackpoint schema convention (FIXTURES.md §2):
    activity_id string, seq long, ts timestamp, lat double, lon double,
    ele double (nullable), ... extra columns pass through.
Channel long format (FIXTURES.md §3):
    activity_id string, channel string, ts timestamp, value double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from activity_files_spark.functions.time import ts_seconds

# Reference constants (raw_editor.dart:82-195)
NULL_ISLAND_EPS = 1e-6
ELE_SENTINEL_M = -499.0  # elevation <= -499 m is cleared (not dropped)


def sort_dedup(
    df: DataFrame,
    key: str = "activity_id",
    ts: str = "ts",
    order: str = "seq",
) -> DataFrame:
    """Stable sort by ts with duplicate-ts resolution: LAST occurrence wins.

    Reference: raw_editor.dart:21-67 — duplicate timestamps keep the last
    occurrence in input order; output sorted ascending by ts. The reference's
    already-sorted short-circuit is unnecessary under Spark (the shuffle is
    avoided by partitioning on ``key`` upstream, not by skipping the sort).
    """
    w = Window.partitionBy(key, ts).orderBy(F.col(order).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def trim_invalid(points: DataFrame) -> DataFrame:
    """Drop invalid coordinates, clear sentinel elevations.

    Reference semantics (raw_editor.dart:82-195):
    - drop rows with non-finite or out-of-range lat∉[-90,90] / lon∉[-180,180]
    - drop Null-Island sentinel rows (|lat| AND |lon| < 1e-6)
    - CLEAR (null out, don't drop) elevation <= -499 m
    """
    finite = (
        F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
        & ~F.isnan("lat")
        & ~F.isnan("lon")
    )
    in_range = (
        (F.col("lat") >= -90.0) & (F.col("lat") <= 90.0)
        & (F.col("lon") >= -180.0) & (F.col("lon") <= 180.0)
    )
    not_null_island = ~(
        (F.abs(F.col("lat")) < NULL_ISLAND_EPS) & (F.abs(F.col("lon")) < NULL_ISLAND_EPS)
    )
    out = points.filter(finite & in_range & not_null_island)
    if "ele" in points.columns:
        out = out.withColumn(
            "ele",
            F.when(F.col("ele").isNotNull() & (F.col("ele") <= ELE_SENTINEL_M), None)
            .otherwise(F.col("ele")),
        )
    return out


def trim_channels_to_envelope(
    channels: DataFrame, points: DataFrame, key: str = "activity_id"
) -> DataFrame:
    """Drop channel samples outside [first, last] point time per activity.

    Reference: raw_editor.dart:155-168. Envelope is tiny (one row per
    activity) → broadcast-joined back.
    """
    env = points.groupBy(key).agg(
        F.min("ts").alias("_t0"), F.max("ts").alias("_t1")
    )
    return (
        channels.join(F.broadcast(env), key)
        .filter((F.col("ts") >= F.col("_t0")) & (F.col("ts") <= F.col("_t1")))
        .drop("_t0", "_t1")
    )


def crop(df: DataFrame, start, end, ts: str = "ts") -> DataFrame:
    """Inclusive time-range filter (raw_editor.dart:201-241)."""
    return df.filter((F.col(ts) >= F.lit(start)) & (F.col(ts) <= F.lit(end)))


def clip_laps(laps: DataFrame, start, end) -> DataFrame:
    """Clip lap intervals to [start, end]; drop laps fully outside."""
    return (
        laps.filter((F.col("end_ts") >= F.lit(start)) & (F.col("start_ts") <= F.lit(end)))
        .withColumn("start_ts", F.greatest(F.col("start_ts"), F.lit(start).cast("timestamp")))
        .withColumn("end_ts", F.least(F.col("end_ts"), F.lit(end).cast("timestamp")))
    )


def delete_range(df: DataFrame, start, end, ts: str = "ts") -> DataFrame:
    """Remove inclusive range, keep timeline gap (raw_editor.dart:367-405)."""
    return df.filter((F.col(ts) < F.lit(start)) | (F.col(ts) > F.lit(end)))


def delete_range_intervals(laps: DataFrame, start, end) -> DataFrame:
    """Interval-relation CASE for deleteRange on laps (raw_editor.dart:822-851):
    drop-inside, clip-straddle, keep-spanning/outside."""
    s, e = F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp")
    inside = (F.col("start_ts") >= s) & (F.col("end_ts") <= e)
    out = laps.filter(~inside)
    # clip a lap that straddles either boundary (a lap spanning the whole
    # deleted range keeps both outer pieces in the reference => keep as-is
    # minus the range; we clip to the nearer boundary on each side)
    out = out.withColumn(
        "start_ts",
        F.when((F.col("start_ts") >= s) & (F.col("start_ts") <= e), e).otherwise(F.col("start_ts")),
    ).withColumn(
        "end_ts",
        F.when((F.col("end_ts") >= s) & (F.col("end_ts") <= e), s).otherwise(F.col("end_ts")),
    )
    return out


def largest_contiguous_group(
    points: DataFrame,
    key: str = "activity_id",
    max_gap_hours: float = 24.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """FIT contiguous-group outlier filter (fit_parser.dart:1252-1332):
    sessionize on time gaps > ``max_gap_hours``; keep the largest group.

    Pure window composition: lag-gap flag → running sum = group id →
    count per group → keep max-count group (earliest wins ties).
    ``tiebreak`` adds a deterministic order column for tied timestamps;
    the running sum uses an explicit ROWS frame (the default RANGE frame
    merges tied-ts peers into one frame and mis-groups them).
    """
    order = ["ts", tiebreak] if tiebreak else ["ts"]
    w = Window.partitionBy(key).orderBy(*order)
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_s = ts_seconds(F.col("ts")) - F.lag(ts_seconds(F.col("ts"))).over(w)
    df = points.withColumn(
        "_new_grp",
        F.when(gap_s.isNull() | (gap_s <= max_gap_hours * 3600.0), 0).otherwise(1),
    ).withColumn("_grp", F.sum("_new_grp").over(wrows))
    counts = df.groupBy(key, "_grp").agg(F.count("*").alias("_cnt"), F.min("ts").alias("_gts"))
    best = (
        counts.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(key).orderBy(F.col("_cnt").desc(), F.col("_gts").asc())
            ),
        )
        .filter(F.col("_rk") == 1)
        .select(key, "_grp")
    )
    return df.join(best, [key, "_grp"], "left_semi").drop("_new_grp", "_grp")


def insert_pause(df: DataFrame, at, duration_s: float, ts: str = "ts") -> DataFrame:
    """Shift every row at/after ``at`` later by ``duration_s`` — the
    reference's pause-insert time edit (raw_editor.dart:412-503). Pure
    expression; channels/laps shift with the same call."""
    at_lit = F.lit(at).cast("timestamp")
    shift = F.expr(f"INTERVAL {int(duration_s)} SECONDS")
    return df.withColumn(
        ts, F.when(F.col(ts) >= at_lit, F.col(ts) + shift).otherwise(F.col(ts))
    )


def remove_pause(df: DataFrame, start, end, ts: str = "ts") -> DataFrame:
    """Delete [start, end) and close the timeline gap: rows at/after ``end``
    shift earlier by the pause length (raw_editor.dart pause removal)."""
    s_lit = F.lit(start).cast("timestamp")
    e_lit = F.lit(end).cast("timestamp")
    import pandas as pd

    dur = int((pd.Timestamp(end) - pd.Timestamp(start)).total_seconds())
    shift = F.expr(f"INTERVAL {dur} SECONDS")
    return df.filter((F.col(ts) < s_lit) | (F.col(ts) >= e_lit)).withColumn(
        ts, F.when(F.col(ts) >= e_lit, F.col(ts) - shift).otherwise(F.col(ts))
    )
