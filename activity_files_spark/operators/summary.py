"""Session summaries, multisport split/merge, gap filling, sport inference.

- :func:`session_summary` — A4 per-activity stats, replicating the
  reference's GeoJSON quirks exactly: lap-HR mean treats null lap averages
  as ZERO (geojson_encoder.dart:63-75), max-HR ignores nulls.
- :func:`split_by_sport` — F4/U3: per-sport lap time envelopes -> point
  filter (facade:832-911).
- :func:`merge_activities` — J5/U1: unionByName + global re-sort
  (facade:751-803; models.dart:1385-1430).
- :func:`fill_time_gaps` — G20: insert up to ``max_points`` lerped points
  per gap > threshold (facade:2290-2350); sequence + explode + lerp, native.
- :func:`infer_sport` — G8 keyword inference with priority order
  (facade:1012-1093) as a when-chain.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from activity_files_spark.functions.geo import lerp
from activity_files_spark.functions.time import ts_seconds


def session_summary(
    points: DataFrame,
    channels: DataFrame | None = None,
    laps: DataFrame | None = None,
    key: str = "activity_id",
) -> DataFrame:
    """Per-activity summary row: duration, point count, channel stats, and
    the reference's lap-HR aggregates (null lap avg counted as 0 in the
    mean; max ignores nulls — geojson_encoder.dart:63-75)."""
    base = points.groupBy(key).agg(
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.count("*").alias("n_points"),
    ).withColumn(
        "duration_s", ts_seconds(F.col("end_ts")) - ts_seconds(F.col("start_ts"))
    )
    if channels is not None:
        hr = channels.filter(F.col("channel") == "heart_rate").groupBy(key).agg(
            F.avg("value").alias("avg_hr"), F.max("value").alias("max_hr")
        )
        base = base.join(hr, key, "left")
    if laps is not None:
        lap_hr = laps.groupBy(key).agg(
            # null-as-zero mean quirk: sum(coalesce(avg,0)) / count(*)
            (
                F.sum(F.coalesce(F.col("lap_avg_hr"), F.lit(0.0)))
                / F.count("*")
            ).alias("lap_mean_avg_hr"),
            F.max("lap_max_hr").alias("lap_max_hr"),  # max ignores nulls
            F.count("*").alias("num_laps"),
        )
        base = base.join(lap_hr, key, "left")
    return base


def split_by_sport(
    points: DataFrame, laps: DataFrame, key: str = "activity_id"
) -> DataFrame:
    """Tag each point with the sport whose lap time-envelope contains it.

    Reference facade:832-911: per-sport envelope = [min(start), max(end)]
    over that sport's laps; points filter into the envelope. Envelopes are
    tiny -> broadcast range join.
    """
    env = laps.filter(F.col("sport").isNotNull()).groupBy(key, "sport").agg(
        F.min("start_ts").alias("_s"), F.max("end_ts").alias("_e")
    )
    return (
        points.join(F.broadcast(env), key)
        .filter((F.col("ts") >= F.col("_s")) & (F.col("ts") <= F.col("_e")))
        .drop("_s", "_e")
    )


def merge_activities(dfs: list[DataFrame], key: str = "activity_id") -> DataFrame:
    """Union-merge point streams, re-sorted per activity (U1/U2)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out.orderBy(key, "ts")


def merge_records(
    sources: list[DataFrame],
    merged_id: str,
    preserve_sport_per_lap: bool = False,
    normalize: bool = True,
    creator: str | None = None,
) -> DataFrame:
    """J5/U1 full-stream merge (facade:751-803): union the unified record
    streams of several activities into one.

    ``preserve_sport_per_lap``: laps lacking a sport inherit their SOURCE
    activity's sport (from its meta record) — the multisport-merge path
    (e.g. swim + bike + run files into a triathlon; facade:786-794). The
    merged activity's own sport/meta come from the FIRST source;
    ``creator`` overrides the creator attr. ``normalize`` applies the O1
    sortAndDedup last-wins pass to points (normalizeActivity).

    Plan: per-source sport is a tiny broadcast map join; everything else is
    unions + one window for the dedup — no driver-side loops over rows.
    """
    if not sources:
        raise ValueError("merge_records: the input list is empty")
    parts = [df.withColumn("_src", F.lit(i)) for i, df in enumerate(sources)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    if preserve_sport_per_lap:
        sport_map = (
            u.filter(F.col("kind") == "meta")
            .select("_src", "activity_id", F.col("sport").alias("_src_sport"))
            .dropDuplicates(["_src", "activity_id"])
        )
        u = u.join(F.broadcast(sport_map), ["_src", "activity_id"], "left").withColumn(
            "sport",
            F.when(
                (F.col("kind") == "lap") & F.col("sport").isNull(),
                F.col("_src_sport"),
            ).otherwise(F.col("sport")),
        ).drop("_src_sport")
    # merged meta = first source's meta (sport, device, creator)
    u = u.filter((F.col("kind") != "meta") | (F.col("_src") == 0))
    if creator is not None:
        u = u.withColumn(
            "attrs",
            F.when(
                F.col("kind") == "meta",
                F.map_concat(
                    F.map_filter(
                        F.coalesce(F.col("attrs"), F.expr("map()")),
                        lambda k, _v: k != "creator",
                    ),
                    F.create_map(F.lit("creator"), F.lit(creator)),
                ),
            ).otherwise(F.col("attrs")),
        )
    merged = u.withColumn("activity_id", F.lit(merged_id))
    if normalize:
        # O1 sortAndDedup last-wins on points: later SOURCE wins on tied ts.
        # Points without a timestamp are exempt (a null-ts partition would
        # collapse them all to one row) and pass through unchanged.
        w = Window.partitionBy("kind", "ts").orderBy(
            F.col("_src").desc(), F.col("seq").desc_nulls_last()
        )
        is_ts_pt = (F.col("kind") == "point") & F.col("ts").isNotNull()
        pts = (
            merged.filter(is_ts_pt)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        merged = merged.filter(~is_ts_pt).unionByName(pts)
    return merged.drop("_src")


def fill_time_gaps(
    points: DataFrame,
    gap_s: float = 300.0,
    step_s: float = 60.0,
    max_inserted: int = 10,
    key: str = "activity_id",
) -> DataFrame:
    """Insert lerped points into gaps > gap_s (G20, facade:2290-2350).

    Native plan: lag window finds gap endpoints; sequence() generates at
    most ``max_inserted`` interior timestamps; explode + lerp lat/lon/ele.
    Inserted rows carry seq = null (synthetic).
    """
    w = Window.partitionBy(key).orderBy("ts")
    gapped = points.select(
        key, "seq", "ts", "lat", "lon", "ele",
        F.lag("ts").over(w).alias("_pts"),
        F.lag("lat").over(w).alias("_plat"),
        F.lag("lon").over(w).alias("_plon"),
        F.lag("ele").over(w).alias("_pele"),
    ).withColumn("_gap", ts_seconds(F.col("ts")) - ts_seconds(F.col("_pts")))
    fills = (
        gapped.filter(F.col("_gap") > gap_s)
        .withColumn(
            "_n", F.least(F.floor(F.col("_gap") / F.lit(step_s)) - 1, F.lit(max_inserted)).cast("int")
        )
        .filter(F.col("_n") >= 1)
        .withColumn("_i", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .withColumn(
            "_ft",
            F.timestamp_seconds(
                ts_seconds(F.col("_pts")) + F.col("_i").cast("double") * F.lit(step_s)
            ),
        )
    )
    t0 = ts_seconds(F.col("_pts"))
    t1 = ts_seconds(F.col("ts"))
    tx = ts_seconds(F.col("_ft"))
    synth = fills.select(
        F.col(key),
        F.lit(None).cast("long").alias("seq"),
        F.col("_ft").cast("timestamp").alias("ts"),
        lerp(t0, t1, F.col("_plat"), F.col("lat"), tx).alias("lat"),
        lerp(t0, t1, F.col("_plon"), F.col("lon"), tx).alias("lon"),
        lerp(t0, t1, F.col("_pele"), F.col("ele"), tx).alias("ele"),
    )
    return points.select(key, "seq", "ts", "lat", "lon", "ele").unionByName(synth)


# G8 sport inference (activity_files_facade.dart:1012-1093):
# keyword TOKEN match (text split on non-alphanumerics, not substring —
# 'runway' must not match), priority order running > cycling > swimming >
# walking > hiking > other; numeric ids index _sportByNumericId.
SPORT_KEYWORDS = [
    ("running", ["run", "running", "jog", "jogging"]),
    ("cycling", ["cycle", "cycling", "bike", "biking", "ride"]),
    ("swimming", ["swim", "swimming"]),
    ("walking", ["walk", "walking"]),
    ("hiking", ["hike", "hiking"]),
    ("other", ["other"]),
]

# facade _sportByNumericId (positional, NOT the FIT sport enum)
SPORT_IDS = ["other", "running", "cycling", "swimming", "walking", "hiking"]

# pluggable mapper registry, checked last-in-first-out so callers can
# override the built-in heuristics (facade:386-398)
_SPORT_MAPPERS: list = []


def register_sport_mapper(mapper) -> None:
    """Register a ``source -> sport|None`` callable; LIFO priority."""
    if mapper not in _SPORT_MAPPERS:
        _SPORT_MAPPERS.append(mapper)


def unregister_sport_mapper(mapper) -> bool:
    try:
        _SPORT_MAPPERS.remove(mapper)
        return True
    except ValueError:
        return False


def clear_sport_mappers() -> None:
    _SPORT_MAPPERS.clear()


def _sport_from_string(text: str) -> str | None:
    tokens = {t for t in re.split(r"[^a-z0-9]+", text.strip().lower()) if t}
    for sport, kws in SPORT_KEYWORDS:
        if tokens.intersection(kws):
            return sport
    return None


def resolve_sport(source) -> str | None:
    """Driver-side sport resolution (facade:1012-1047): registered mappers
    (LIFO) -> primitive inference (string token match, numeric id lookup)
    -> recursive descent into dict values / iterables."""
    for mapper in reversed(_SPORT_MAPPERS):
        result = mapper(source)
        if result is not None:
            return result
    if isinstance(source, str):
        got = _sport_from_string(source)
        if got is not None:
            return got
    elif isinstance(source, bool):
        return None
    elif isinstance(source, (int, float)):
        idx = int(source)
        if 0 <= idx < len(SPORT_IDS) and float(source) == idx:
            return SPORT_IDS[idx]
        return None
    if isinstance(source, dict):
        for value in source.values():
            nested = resolve_sport(value)
            if nested is not None:
                return nested
    elif isinstance(source, (list, tuple, set)):
        for value in source:
            nested = resolve_sport(value)
            if nested is not None:
                return nested
    return None


def infer_sport(text_col) -> "F.Column":
    """Column twin of the string path of :func:`resolve_sport`: token-set
    keyword match in priority order — pure expressions, no UDF."""
    tokens = F.split(F.lower(F.trim(text_col)), r"[^a-z0-9]+")
    expr = F.lit(None).cast("string")
    for sport, kws in reversed(SPORT_KEYWORDS):
        hit = F.arrays_overlap(tokens, F.array(*[F.lit(k) for k in kws]))
        expr = F.when(hit, sport).otherwise(expr)
    return expr


def infer_sport_numeric(id_col) -> "F.Column":
    """Column twin of the numeric-id path (facade _sportByNumericId)."""
    expr = F.lit(None).cast("string")
    for idx, sport in enumerate(SPORT_IDS):
        expr = F.when(id_col == idx, sport).otherwise(expr)
    return expr
