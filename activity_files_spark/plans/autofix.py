"""Auto-fix pipeline: the reference's composable, option-driven
normalization chain re-expressed as one declarative Spark plan.

Reference: activity_files_facade.dart:2167-2288 (_autoFixCommonIssues,
_autoLapDistanceForSport, _autoFixDiagnostics) and pipeline_options.dart:
40-104 (ActivityAutoFixOptions — defaults incl. the sport-specific split
distances: 1 km running/walking/hiking, 5 km cycling, 1 km everything else).

Stage order matches the reference exactly:

  sortAndDedup -> trimInvalid (+ channel-envelope trim) ->
  recomputeDistanceAndSpeed -> fillTimestampGaps ->
  autoLapByDistance (sport-specific split, only-when-missing gate)

plus before/after diff diagnostics (``autofix.*`` codes). Everything is a
DataFrame transformation — per-activity counters come from groupBy
aggregates, the sport-specific split is a joined column, and no stage
collects to the driver, so the pipeline runs unchanged over millions of
activities.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RUNNING_LIKE = ("running", "walking", "hiking")
PLACEHOLDER_LAP_PREFIXES = ("Segment", "Split")


@dataclass(frozen=True)
class AutoFixOptions:
    """pipeline_options.dart:40-104 ActivityAutoFixOptions."""

    fix_invalid_gps: bool = True
    fix_channel_drift: bool = True
    fix_distance_drift: bool = True
    fix_timestamp_gaps: bool = True
    auto_lap_by_distance: bool = False
    auto_lap_only_when_missing: bool = True
    auto_lap_distance_m: float | None = None
    running_lap_distance_m: float = 1000.0
    cycling_lap_distance_m: float = 5000.0
    default_lap_distance_m: float = 1000.0
    gap_threshold_s: float = 300.0
    max_inserted_gap_points: int = 250

    @classmethod
    def disabled(cls) -> "AutoFixOptions":
        return cls(
            fix_invalid_gps=False,
            fix_channel_drift=False,
            fix_distance_drift=False,
            fix_timestamp_gaps=False,
            auto_lap_by_distance=False,
            max_inserted_gap_points=0,
        )

    def enabled(self, **overrides) -> "AutoFixOptions":
        return replace(self, **overrides)

    @property
    def is_enabled(self) -> bool:
        return (
            self.fix_invalid_gps
            or self.fix_channel_drift
            or self.fix_distance_drift
            or (self.fix_timestamp_gaps and self.max_inserted_gap_points > 0)
            or self.auto_lap_by_distance
        )


def auto_lap_distance_for_sport(sport_col, options: AutoFixOptions):
    """Sport-specific split distance (facade:2218-2236): running/walking/
    hiking 1 km, cycling 5 km, everything else the default; a positive
    global override wins."""
    if options.auto_lap_distance_m is not None and options.auto_lap_distance_m > 0:
        return F.lit(float(options.auto_lap_distance_m))
    s = F.lower(F.coalesce(sport_col, F.lit("")))
    return (
        F.when(s.isin(*RUNNING_LIKE), F.lit(float(options.running_lap_distance_m)))
        .when(s == "cycling", F.lit(float(options.cycling_lap_distance_m)))
        .otherwise(F.lit(float(options.default_lap_distance_m)))
    )


def _count_by(df: DataFrame, alias: str, key: str = "activity_id") -> DataFrame:
    return df.groupBy(key).agg(F.count("*").alias(alias))


def auto_fix(
    points: DataFrame,
    channels: DataFrame | None = None,
    laps: DataFrame | None = None,
    sports: DataFrame | None = None,
    options: AutoFixOptions = AutoFixOptions(),
    key: str = "activity_id",
) -> dict:
    """Run the auto-fix chain; returns ``{"points", "channels", "laps",
    "diagnostics"}`` DataFrames.

    ``sports`` is an optional per-activity (key, sport) frame used for the
    sport-specific auto-lap split; activities without a sport row use the
    default split (reference Sport.unknown behaviour).
    """
    from activity_files_spark.operators.normalize import (
        sort_dedup,
        trim_channels_to_envelope,
        trim_invalid,
    )
    from activity_files_spark.operators.summary import fill_time_gaps
    from activity_files_spark.operators.windows import (
        cumulative_distance,
        mark_laps_by_distance,
        recompute_speed,
    )

    before_pts = _count_by(points, "_n_before", key)

    # 1. sortAndDedup — unconditional (facade:2171)
    fixed = sort_dedup(points, key=key)

    # 2. trimInvalid (+ channel window) — facade:2172-2174. NOTE the two
    # flags are intentionally coupled exactly like the reference
    # (`if (fixInvalidGps || fixChannelDrift) editor.trimInvalid()`): either
    # flag runs the combined point-trim + channel-envelope stage.
    before_ch = after_trim_ch = None
    if options.fix_invalid_gps or options.fix_channel_drift:
        fixed = trim_invalid(fixed)
        if channels is not None:
            before_ch = _count_by(channels, "_c_before", key)
            channels = trim_channels_to_envelope(channels, fixed, key=key)
            # measured HERE — before recompute replaces distance/speed —
            # so the drift diagnostic counts exactly what the trim dropped
            after_trim_ch = _count_by(channels, "_c_after", key)
    # trimmed-point diagnostic diff is taken at this point in the chain
    # (before gap-fill INSERTS points, which would cancel the count)
    after_trim_pts = _count_by(fixed, "_n_after", key)

    # 3. recomputeDistanceAndSpeed — facade:2175-2177: distance and speed
    # become channels derived from the (now clean) trajectory, replacing any
    # stale ones the source carried
    had_distance = None
    if options.fix_distance_drift:
        if channels is not None:
            had_distance = (
                channels.filter(F.col("channel") == "distance")
                .select(key).distinct()
                .withColumn("_had_dist", F.lit(True))
            )
        derived = recompute_speed(
            cumulative_distance(fixed, key=key), key=key, out="speed_mps"
        )
        new_ch = derived.select(
            key, "ts",
            F.explode(F.array(
                F.struct(F.lit("distance").alias("channel"),
                         F.col("distance_m").alias("value")),
                F.struct(F.lit("speed").alias("channel"),
                         F.col("speed_mps").alias("value")),
            )).alias("cv"),
        ).select(key, "ts", F.col("cv.channel").alias("channel"),
                 F.col("cv.value").alias("value"))
        if channels is not None:
            channels = channels.filter(
                ~F.col("channel").isin("distance", "speed")
            ).unionByName(new_ch)
        else:
            channels = new_ch

    # 4. fillTimestampGaps — facade:2178-2184
    if options.fix_timestamp_gaps and options.max_inserted_gap_points > 0:
        fixed = fill_time_gaps(
            fixed,
            gap_s=options.gap_threshold_s,
            max_inserted=options.max_inserted_gap_points,
            key=key,
        )

    # 5. autoLapByDistance — facade:2185-2214: regenerate when forced, when
    # the activity has no laps, or when every lap is a placeholder
    # ("Segment*"/"Split*" names)
    generated = None
    before_laps = _count_by(laps, "_l_before", key) if laps is not None else None
    if options.auto_lap_by_distance:
        if laps is not None and options.auto_lap_only_when_missing:
            placeholder = F.lit(False)
            if "attrs" in laps.columns:
                for p in PLACEHOLDER_LAP_PREFIXES:
                    placeholder = placeholder | F.coalesce(
                        F.col("attrs")["name"].startswith(p), F.lit(False)
                    )
            lap_state = laps.groupBy(key).agg(
                F.count("*").alias("_n_laps"),
                F.min(placeholder.cast("int")).alias("_all_ph"),
            )
            # activities with real (non-placeholder) laps are never regenerated
            keep = lap_state.filter(F.col("_all_ph") == 0).select(key)
            regen_pts = fixed.join(keep, key, "left_anti")
        else:
            regen_pts = fixed
        # the reference only auto-laps activities with >= 2 points
        pt2 = fixed.groupBy(key).agg(F.count("*").alias("_np")).filter(
            F.col("_np") >= 2
        ).select(key)
        regen_pts = regen_pts.join(pt2, key)
        split = (
            regen_pts.join(F.broadcast(sports), key, "left")
            if sports is not None
            else regen_pts.withColumn("sport", F.lit(None).cast("string"))
        )
        generated = mark_laps_by_distance(
            split,
            auto_lap_distance_for_sport(F.col("sport"), options),
            key=key,
        )
        gen_cols = [key, "lap_id", "start_ts", "end_ts", "distance_m"]
        if laps is not None:
            # replace laps ONLY for activities that actually regenerated
            # (derived from regen_pts, so an all-placeholder activity that
            # cannot regenerate — < 2 points — keeps its original laps)
            regen_keys = regen_pts.select(key).distinct()
            kept_laps = laps.join(regen_keys, key, "left_anti")
            laps = kept_laps.select(*gen_cols).unionByName(
                generated.select(*gen_cols)
            )
        else:
            laps = generated.select(*gen_cols)

    diags = _autofix_diagnostics(
        before_pts, after_trim_pts, before_ch, after_trim_ch, had_distance,
        generated, key, recomputed=options.fix_distance_drift,
        before_laps=before_laps,
    )
    return {"points": fixed, "channels": channels, "laps": laps,
            "diagnostics": diags}


def _autofix_diagnostics(
    before_pts: DataFrame,
    after_trim_pts: DataFrame,
    before_ch: DataFrame | None,
    after_trim_ch: DataFrame | None,
    had_distance: DataFrame | None,
    generated_laps: DataFrame | None,
    key: str,
    recomputed: bool = False,
    before_laps: DataFrame | None = None,
) -> DataFrame:
    """Before/after diff diagnostics (facade:2238-2288): info rows per
    activity for trimmed points, trimmed channel samples, recomputed
    distance, and auto-generated laps. Both trim diffs are measured
    IMMEDIATELY after the trim stage — before gap-fill inserts points and
    before recompute replaces distance/speed channels — so counts reflect
    exactly what trimming removed (the reference diffs the whole chain,
    which lets insertions cancel removals; measuring at the stage boundary
    is strictly more truthful)."""
    stats = before_pts.join(after_trim_pts, key, "left").withColumn(
        "_removed", F.col("_n_before") - F.coalesce("_n_after", F.lit(0))
    )
    parts = [
        stats.filter(F.col("_removed") > 0).select(
            key,
            F.lit("autofix.invalid_gps.trimmed").alias("code"),
            F.lit("info").alias("severity"),
            F.concat(F.lit("Auto-fix removed "), F.col("_removed"),
                     F.lit(" invalid/out-of-range points.")).alias("message"),
        )
    ]
    if before_ch is not None and after_trim_ch is not None:
        cstats = before_ch.join(after_trim_ch, key, "left").withColumn(
            "_c_removed", F.col("_c_before") - F.coalesce("_c_after", F.lit(0))
        )
        parts.append(
            cstats.filter(F.col("_c_removed") > 0).select(
                key,
                F.lit("autofix.channel_drift.trimmed").alias("code"),
                F.lit("info").alias("severity"),
                F.concat(
                    F.lit("Auto-fix removed "), F.col("_c_removed"),
                    F.lit(" channel samples outside the valid trajectory window."),
                ).alias("message"),
            )
        )
    if recomputed:
        # distance channel present after but not before -> recomputed-anew
        # (had_distance None means the source carried no channels at all)
        base = (
            before_pts.join(had_distance, key, "left_anti")
            if had_distance is not None else before_pts
        )
        parts.append(
            base.select(
                key,
                F.lit("autofix.distance.recomputed").alias("code"),
                F.lit("info").alias("severity"),
                F.lit("Auto-fix recomputed distance/speed channels from GPS points.")
                .alias("message"),
            )
        )
    if generated_laps is not None:
        # facade:2277-2286: emitted only when after.laps.length >
        # before.laps.length, reporting the DELTA — 3 placeholder laps
        # regenerated into 2 emits nothing
        gcount = _count_by(generated_laps, "_g", key)
        if before_laps is not None:
            gcount = gcount.join(before_laps, key, "left")
        else:
            gcount = gcount.withColumn("_l_before", F.lit(None).cast("long"))
        delta = F.col("_g") - F.coalesce(F.col("_l_before"), F.lit(0))
        parts.append(
            gcount.filter(delta > 0).select(
                key,
                F.lit("autofix.laps.auto_generated").alias("code"),
                F.lit("info").alias("severity"),
                F.concat(F.lit("Auto-fix generated "), delta,
                         F.lit(" lap(s) from distance splits.")).alias("message"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
