"""spark-submit entry point (S14 — the reference CLI re-expressed).

Usage (package the library with --py-files):

    zip -r engine.zip activity_files_spark
    spark-submit --py-files engine.zip spark_main.py convert \\
        --input /data/raw --from auto --to gpx --output /data/out
    spark-submit ... spark_main.py validate --input /data/raw --from auto --report /data/diag
    spark-submit ... spark_main.py tile --images /data/images.parquet --resolutions 8,10,12 \\
        --geofences /data/geofences.json --output /data/tiles --manifest /data/ckpt

(spark-submit takes an application file, not a module; `spark_main.py` at the
repo root is the one-file launcher, proven zip-only importable by
tests/test_spark_submit.py.)

Reference: bin/activity_files.dart:37-394 (convert/validate commands).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


# accepted --encoding names -> JVM charset (reference: Dart Encoding names)
_CHARSETS = {
    "utf8": "UTF-8", "utf-8": "UTF-8",
    "latin1": "ISO-8859-1", "iso-8859-1": "ISO-8859-1",
    "ascii": "US-ASCII",
    "utf16": "UTF-16", "utf-16": "UTF-16",
    "utf16le": "UTF-16LE", "utf16be": "UTF-16BE",
}


def _load_records(spark, args):
    from activity_files_spark.sources.csvsrc import csv_records
    from activity_files_spark.sources.detect import detect_format_df
    from activity_files_spark.sources.fit import fit_records
    from activity_files_spark.sources.geojson import geojson_records
    from activity_files_spark.sources.gpx import gpx_records
    from activity_files_spark.sources.records import RECORD_SCHEMA
    from activity_files_spark.sources.tcx import tcx_records

    files = spark.read.format("binaryFile").load(args.input).select(
        F.col("path").alias("activity_id"), F.col("content").alias("payload")
    )
    if args.from_fmt == "auto":
        files = detect_format_df(files, payload_col="payload", path_col="activity_id")
    else:
        files = files.withColumn("fmt", F.lit(args.from_fmt))
    # --encoding: text decode for GPX/TCX/CSV/GeoJSON inputs (reference
    # bin/activity_files.dart 'encoding' option; FIT is binary, unaffected).
    # Native F.decode keeps the conversion JVM-side.
    charset = _CHARSETS.get((getattr(args, "encoding", "utf8") or "utf8").lower())
    if charset is None:
        raise SystemExit(
            f"unsupported --encoding (choose from {sorted(_CHARSETS)})"
        )
    # BOM-priority decode (facade _parseBytesWithBom parity): a UTF-16/32/8
    # BOM always wins over --encoding; UTF-32 rows (outside Spark's decode
    # charset set) take a vectorized Arrow fallback, everything else stays
    # JVM-side
    from activity_files_spark.sources.detect import (
        decode_text_col,
        decode_text_utf32_df,
        has_utf32_bom_col,
    )

    is32 = has_utf32_bom_col(F.col("payload"))
    decoded = decode_text_col(F.col("payload"), charset)
    text = files.filter(~is32).withColumn("xml", decoded).withColumn("text", decoded)
    t32 = decode_text_utf32_df(files.filter(is32), out_col="text")
    text = text.unionByName(t32.withColumn("xml", F.col("text")))
    parts = [
        gpx_records(text.filter(F.col("fmt") == "gpx"), id_col="activity_id", xml_col="xml"),
        tcx_records(text.filter(F.col("fmt") == "tcx"), id_col="activity_id", xml_col="xml"),
        geojson_records(text.filter(F.col("fmt") == "geojson"), id_col="activity_id", text_col="text"),
        csv_records(text.filter(F.col("fmt") == "csv"), id_col="activity_id", text_col="text"),
        fit_records(files.filter(F.col("fmt") == "fit"), id_col="activity_id"),
    ]
    # undetectable payloads become diagnostics, never silent drops
    unknown = files.filter(F.col("fmt").isNull()).select(
        F.col("activity_id"),
        F.lit("diag").alias("kind"),
        F.create_map(
            F.lit("code"), F.lit("detect.unknown_format"),
            F.lit("severity"), F.lit("error"),
            F.lit("message"), F.lit("format not detectable"),
        ).alias("attrs"),
    )
    spark = files.sparkSession
    empty = spark.createDataFrame([], RECORD_SCHEMA)
    parts.append(empty.unionByName(unknown, allowMissingColumns=True))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_STREAM_NULLS = {
    "seq": "long", "ts": "timestamp", "lat": "double", "lon": "double",
    "ele": "double", "channel": "string", "value": "double",
    "lap_id": "int", "start_ts": "timestamp", "end_ts": "timestamp",
    "distance_m": "double", "sport": "string",
}


def _widen_stream(df, kind: str):
    """Split-table frame -> unified record-stream shape (missing columns
    null-typed) so processed points/channels can rejoin raw stream rows."""
    out = df.withColumn("kind", F.lit(kind))
    for c, t in _STREAM_NULLS.items():
        if c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast(t))
    if "attrs" not in out.columns:
        out = out.withColumn("attrs", F.lit(None).cast("map<string,string>"))
    return out.select("activity_id", "kind", *_STREAM_NULLS.keys(), "attrs")


def cmd_convert(spark, args) -> int:
    from activity_files_spark.operators.normalize import sort_dedup, trim_invalid
    from activity_files_spark.sources.gpx import gpx_encode_df
    from activity_files_spark.sources.records import (
        channels_of,
        laps_of,
        meta_of,
        points_of,
    )
    from activity_files_spark.sources.tcx import tcx_encode_df

    records = _load_records(spark, args).cache()
    autofix_diags = None
    if getattr(args, "autofix", False):
        # the reference's declarative pipeline (facade:1472-1501): request ->
        # autofix chain -> export, with before/after diff diagnostics
        from activity_files_spark.plans.autofix import AutoFixOptions, auto_fix

        sports = records.filter(F.col("kind") == "meta").select(
            "activity_id", "sport"
        )
        fixed = auto_fix(
            points_of(records),
            channels=channels_of(records),
            laps=laps_of(records),
            sports=sports,
            options=AutoFixOptions(
                auto_lap_by_distance=getattr(args, "auto_lap", False)
            ),
        )
        points, channels, laps = fixed["points"], fixed["channels"], fixed["laps"]
        autofix_diags = fixed["diagnostics"].select(
            "activity_id", "code", "severity",
            F.col("message").alias("detail"),
            F.lit(None).cast("string").alias("fix"),
        )
    else:
        points = trim_invalid(sort_dedup(points_of(records)))
        channels = channels_of(records)
        laps = laps_of(records)
    # encoder-side channel association (channel_mapper.dart + EncoderOptions
    # maxDelta): snap each channel's nearest sample within tolerance onto the
    # final point timestamps; identity on already-aligned data
    from activity_files_spark.operators.asof import snap_channels_to_points

    overrides = {
        ch: getattr(args, attr)
        for ch, attr in (("heart_rate", "hr_max_delta"),
                         ("cadence", "cadence_max_delta"),
                         ("power", "power_max_delta"),
                         ("temperature", "temp_max_delta"))
        if getattr(args, attr, None) is not None
    }
    # channel-name set from the CACHED records (not the heavy post-autofix
    # plan), plus the channels autofix recomputes; timer events are punctual
    # markers, not samples — they bypass snapping untouched
    names = {
        r["channel"]
        for r in records.filter(F.col("kind") == "channel")
        .select("channel").distinct().collect()
        if r["channel"] and r["channel"] != "event"
    }
    if getattr(args, "autofix", False):
        names |= {"distance", "speed"}
    event_rows = channels.filter(F.col("channel") == "event")
    snapped = snap_channels_to_points(
        points, channels.filter(F.col("channel") != "event"),
        tolerances=overrides,
        default_tol_s=getattr(args, "max_delta_seconds", 5.0),
        channel_names=sorted(names),
    ) if names else channels.filter(F.col("channel") != "event")
    channels = snapped.unionByName(
        event_rows.select("activity_id", "ts", "channel", "value")
    )

    if args.to_fmt == "gpx":
        # GPX keeps no lap structure (lossy.laps_dropped reports it), but
        # standalone waypoints, routes, and metadata survive gpx -> gpx:
        # the normalized points/channels rejoin the source stream's
        # waypoint/route/meta records through the lossless record-stream
        # encoder (reference gpx_encoder.dart:125-130 writes wpt/rte
        # before tracks)
        from activity_files_spark.sources.gpx import gpx_encode_records

        stream = _widen_stream(points, "point").unionByName(
            _widen_stream(channels, "channel")
        ).unionByName(
            records.filter(
                F.col("kind").isin("waypoint", "route", "route_point", "meta")
            )
        )
        enc = gpx_encode_records(
            stream,
            version=getattr(args, "gpx_version", "1.1"),
            coord_dp=getattr(args, "precision_latlon", 6),
            ele_dp=getattr(args, "precision_ele", 2),
        )
        payload_col = "xml"
    elif args.to_fmt == "tcx":
        enc = tcx_encode_df(points, channels, laps,
                            version=getattr(args, "tcx_version", "2"))
        payload_col = "xml"
    elif args.to_fmt == "geojson":
        from activity_files_spark.sources.geojson import geojson_encode_df

        enc = geojson_encode_df(points)
        payload_col = "text"
    elif args.to_fmt == "fit":
        from activity_files_spark.sources.fit import fit_encode_df

        enc = fit_encode_df(points, channels, laps)
        payload_col = "payload"
    elif args.to_fmt == "csv":
        from activity_files_spark.sources.csvsrc import csv_encode_text_df

        enc = csv_encode_text_df(points, channels)
        payload_col = "text"
    else:
        print(f"unsupported --to {args.to_fmt}", file=sys.stderr)
        return 2
    # cache: the write, the count, the report write, and the counts collect
    # would otherwise each re-execute the full (autofix) pipeline
    enc = enc.select("activity_id", F.col(payload_col)).cache()
    enc.write.mode("overwrite").parquet(args.output)
    # target-format loss accounting (facade.dart:299-382): what the source
    # carried that `--to` cannot represent is reported, never silent
    from activity_files_spark.operators.validation import lossy_diagnostics

    diags = lossy_diagnostics(records, args.to_fmt)
    if autofix_diags is not None:
        diags = diags.unionByName(autofix_diags)
    diags = diags.cache()
    if getattr(args, "report", None):
        diags.write.mode("overwrite").parquet(args.report)
    counts = {
        r["code"]: r["n"]
        for r in diags.groupBy("code").agg(F.count("*").alias("n")).collect()
    }
    print(json.dumps({
        "converted": enc.count(), "to": args.to_fmt, "output": args.output,
        "diagnostics": counts,
    }))
    enc.unpersist()
    diags.unpersist()
    return 0


def cmd_validate(spark, args) -> int:
    from activity_files_spark.operators.validation import validate_all
    from activity_files_spark.sources.records import (
        channels_of,
        diagnostics_of,
        laps_of,
        points_of,
    )

    records = _load_records(spark, args).cache()
    diags = validate_all(
        points_of(records), channels_of(records), laps_of(records),
        gap_warn_s=getattr(args, "gap_threshold", 300.0),
    )
    parse_diags = diagnostics_of(records).select(
        "activity_id",
        F.col("attrs")["code"].alias("code"),
        F.col("attrs")["severity"].alias("severity"),
        F.col("attrs")["message"].alias("detail"),
    )
    all_diags = diags.unionByName(parse_diags)
    if args.report:
        all_diags.write.mode("overwrite").parquet(args.report)
    counts = {r["severity"]: r["n"] for r in all_diags.groupBy("severity").agg(F.count("*").alias("n")).collect()}
    print(json.dumps({"diagnostics": counts}))
    return 1 if args.strict and counts.get("error", 0) > 0 else 0


def cmd_tile(spark, args) -> int:
    from activity_files_spark.operators.spatial import pip_join
    from activity_files_spark.operators.tiling import tile_assign, validate_images
    from activity_files_spark.plans.manifest import Manifest

    resolutions = [int(z) for z in args.resolutions.split(",")]
    m = Manifest(spark, args.manifest) if args.manifest else None

    def load():
        return spark.read.parquet(args.images)

    def tiles():
        imgs = load().select("image_id", "lat", "lon")
        return tile_assign(imgs, resolutions=resolutions)

    if m:
        tiles_df = m.run_stage("tiles", tiles, inputs=[args.images],
                               config={"resolutions": resolutions})
    else:
        tiles_df = tiles()
    tiles_df.write.mode("overwrite").partitionBy("zoom").parquet(args.output)

    result = {"tiles": tiles_df.count(), "output": args.output}
    if args.geofences:
        with open(args.geofences) as f:
            polys = json.load(f)
        hits = pip_join(load().select("image_id", "lat", "lon"), polys)
        result["pip_rows"] = hits.count()
    if args.validate:
        bad = validate_images(load()).filter(~F.col("ok")).count()
        result["invalid_images"] = bad
    print(json.dumps(result))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="activity_files_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert")
    c.add_argument("--input", required=True)
    c.add_argument("--from", dest="from_fmt", default="auto")
    c.add_argument("--to", dest="to_fmt", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--report", default=None,
                   help="optional parquet path for lossy.*/autofix.* diagnostics")
    c.add_argument("--autofix", action="store_true",
                   help="run the auto-fix chain (sort+dedup, trim, recompute "
                        "distance/speed, gap-fill) before encoding")
    c.add_argument("--auto-lap", dest="auto_lap", action="store_true",
                   help="with --autofix: generate distance-split laps when "
                        "missing (1 km run / 5 km bike)")
    # encoder options (reference bin/activity_files.dart:313-360)
    c.add_argument("--encoding", default="utf8",
                   help="text encoding for GPX/TCX/CSV/GeoJSON inputs")
    c.add_argument("--max-delta-seconds", dest="max_delta_seconds",
                   type=float, default=5.0,
                   help="channel-to-point association tolerance")
    for ch in ("hr", "cadence", "power", "temp"):
        c.add_argument(f"--{ch}-max-delta", dest=f"{ch}_max_delta",
                       type=float, default=None)
    c.add_argument("--gpx-version", default="1.1", choices=["1.0", "1.1"])
    c.add_argument("--tcx-version", dest="tcx_version", default="2",
                   choices=["1", "2"])
    c.add_argument("--precision-latlon", dest="precision_latlon",
                   type=int, default=6)
    c.add_argument("--precision-ele", dest="precision_ele", type=int, default=2)

    v = sub.add_parser("validate")
    v.add_argument("--input", required=True)
    v.add_argument("--from", dest="from_fmt", default="auto")
    v.add_argument("--report", default=None)
    v.add_argument("--strict", action="store_true")
    v.add_argument("--gap-threshold", dest="gap_threshold", type=float,
                   default=300.0,
                   help="seconds between points before a gap warning "
                        "(reference bin/activity_files.dart:244)")

    t = sub.add_parser("tile")
    t.add_argument("--images", required=True)
    t.add_argument("--resolutions", default="8,10,12")
    t.add_argument("--geofences", default=None)
    t.add_argument("--output", required=True)
    t.add_argument("--manifest", default=None)
    t.add_argument("--validate", action="store_true")

    args = ap.parse_args(argv)
    from activity_files_spark.session import get_spark

    spark = get_spark("activity_files_spark_cli")
    if args.cmd == "convert":
        return cmd_convert(spark, args)
    if args.cmd == "validate":
        return cmd_validate(spark, args)
    if args.cmd == "tile":
        return cmd_tile(spark, args)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
