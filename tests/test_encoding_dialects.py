"""XML encoding + namespace dialect goldens — the reference tolerates
BOM'd UTF-16/UTF-32 XML and namespace-prefix soup end-to-end
(activity_files_facade.dart:2051-2126 `_parseBytesWithBom`; gpx/tcx
parsers resolve by local name). These push the repo's BOM-priority decode
(sources/detect.decode_text_col + the UTF-32 Arrow fallback) and the
namespace-agnostic parsers through the same encodings.
"""

from pyspark.sql import functions as F

from activity_files_spark.sources.detect import (
    decode_text_col,
    decode_text_utf32_df,
    detect_format_py,
    has_utf32_bom_col,
)
from activity_files_spark.sources.gpx import gpx_records
from activity_files_spark.sources.records import points_of
from activity_files_spark.sources.tcx import tcx_records

GPX = """<?xml version="1.0"?>
<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
  <trk><trkseg>
    <trkpt lat="40.0" lon="-105.0"><ele>1600.5</ele><time>2024-03-01T10:00:00Z</time></trkpt>
    <trkpt lat="40.001" lon="-105.001"><ele>1601.5</ele><time>2024-03-01T10:00:10Z</time></trkpt>
  </trkseg></trk>
</gpx>"""


def _decode_df(spark, payload: bytes, charset: str = "UTF-8"):
    files = spark.createDataFrame([("f", payload)], "activity_id string, payload binary")
    is32 = has_utf32_bom_col(F.col("payload"))
    jvm = files.filter(~is32).withColumn("xml", decode_text_col(F.col("payload"), charset))
    u32 = decode_text_utf32_df(files.filter(is32), out_col="xml")
    return jvm.unionByName(u32.select(*jvm.columns))


def _assert_two_points(spark, payload: bytes):
    rec = gpx_records(_decode_df(spark, payload), xml_col="xml")
    pts = points_of(rec).orderBy("seq").collect()
    assert len(pts) == 2
    assert abs(pts[0]["lat"] - 40.0) < 1e-9
    assert pts[0]["ele"] == 1600.5
    return pts


def test_utf16_le_bom_gpx(spark):
    # python 'utf-16' emits the LE BOM
    _assert_two_points(spark, GPX.encode("utf-16"))


def test_utf16_be_bom_gpx(spark):
    _assert_two_points(spark, b"\xfe\xff" + GPX.encode("utf-16-be"))


def test_utf32_le_bom_gpx(spark):
    _assert_two_points(spark, b"\xff\xfe\x00\x00" + GPX.encode("utf-32-le"))


def test_utf32_be_bom_gpx(spark):
    _assert_two_points(spark, b"\x00\x00\xfe\xff" + GPX.encode("utf-32-be"))


def test_utf8_sig_bom_gpx(spark):
    _assert_two_points(spark, b"\xef\xbb\xbf" + GPX.encode("utf-8"))


def test_bom_wins_over_declared_encoding(spark):
    """facade parity: the BOM overrides the caller's --encoding choice —
    decoding a UTF-16LE file with charset ISO-8859-1 still works."""
    _assert_two_points(spark, GPX.encode("utf-16"))
    rec = gpx_records(_decode_df(spark, GPX.encode("utf-16"), charset="ISO-8859-1"))
    assert points_of(rec).count() == 2


def test_latin1_declared_encoding_no_bom(spark):
    """No BOM: the declared charset applies (a latin-1 creator name with a
    non-ASCII byte survives)."""
    xml = GPX.replace('creator="t"', 'creator="café"').encode("latin-1")
    rec = gpx_records(_decode_df(spark, xml, charset="ISO-8859-1"))
    assert points_of(rec).count() == 2


def test_detect_format_sniffs_through_utf16_bom():
    assert detect_format_py(GPX.encode("utf-16")) == "gpx"
    assert detect_format_py(b"\x00\x00\xfe\xff" + GPX.encode("utf-32-be")) == "gpx"


GPX_PREFIX_SOUP = """<?xml version="1.0"?>
<g:gpx version="1.1" creator="soup" xmlns:g="http://www.topografix.com/GPX/1/1"
       xmlns:w="http://weird.example/ns">
  <g:trk><g:trkseg>
    <g:trkpt lat="40.0" lon="-105.0"><g:ele>1600.5</g:ele>
      <g:time>2024-03-01T10:00:00Z</g:time></g:trkpt>
    <g:trkpt lat="40.001" lon="-105.001"><g:ele>1601.5</g:ele>
      <g:time>2024-03-01T10:00:10Z</g:time></g:trkpt>
  </g:trkseg></g:trk>
</g:gpx>"""


def test_gpx_namespace_prefix_soup(spark):
    """Every element carries an explicit prefix: local-name matching must
    resolve them (gpx_parser.dart matches by local name)."""
    rec = gpx_records(
        spark.createDataFrame([("p", GPX_PREFIX_SOUP)], "activity_id string, xml string")
    )
    pts = points_of(rec).orderBy("seq").collect()
    assert len(pts) == 2
    assert pts[1]["ele"] == 1601.5


TCX_PREFIX_SOUP = """<?xml version="1.0"?>
<t:TrainingCenterDatabase
    xmlns:t="http://www.garmin.com/xmlschemas/TrainingCenterDatabase/v2">
  <t:Activities><t:Activity Sport="Running"><t:Id>x</t:Id>
    <t:Lap StartTime="2024-03-01T10:00:00Z"><t:TotalTimeSeconds>10</t:TotalTimeSeconds>
      <t:Track><t:Trackpoint><t:Time>2024-03-01T10:00:00Z</t:Time>
        <t:Position><t:LatitudeDegrees>40.0</t:LatitudeDegrees>
        <t:LongitudeDegrees>-105.0</t:LongitudeDegrees></t:Position>
      </t:Trackpoint></t:Track>
    </t:Lap>
  </t:Activity></t:Activities>
</t:TrainingCenterDatabase>"""


def test_tcx_namespace_prefix_soup_utf16(spark):
    """Prefix soup AND a UTF-16 BOM at once — the full dialect gauntlet."""
    rec = tcx_records(_decode_df(spark, TCX_PREFIX_SOUP.encode("utf-16")))
    pts = points_of(rec).collect()
    assert len(pts) == 1
    assert abs(pts[0]["lat"] - 40.0) < 1e-9


def test_cli_load_records_utf16_file(spark, tmp_path):
    """End-to-end through the CLI loader: a BOM'd UTF-16 .gpx on disk with
    the DEFAULT --encoding parses to points."""
    import argparse

    from activity_files_spark.cli import _load_records

    p = tmp_path / "ride.gpx"
    p.write_bytes(GPX.encode("utf-16"))
    args = argparse.Namespace(input=str(p), from_fmt="auto", encoding="utf8")
    rec = _load_records(spark, args)
    assert rec.filter(F.col("kind") == "point").count() == 2
