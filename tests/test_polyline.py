"""Encoded-polyline relational codec (functions/polyline.py): Google spec
vector, Spark Column == DuckDB SQL twin parity, and decode round-trips."""

import duckdb
from pyspark.sql import Window
from pyspark.sql import functions as F

from activity_files_spark.functions.polyline import (
    chunks_col,
    chunks_sql,
    decode_polyline,
    e5_col,
    e5_sql,
    zigzag_col,
    zigzag_sql,
)

GOOGLE_POINTS = [(38.5, -120.2), (40.7, -120.95), (43.252, -126.453)]
GOOGLE_ENCODED = "_p~iF~ps|U_ulLnnqC_mqNvxq`@"


def _encode_spark(spark, rows):
    df = spark.createDataFrame(rows, ["k", "seq", "lat", "lon"])
    w = Window.partitionBy("k").orderBy("seq")
    e = df.select(
        "k", "seq", e5_col(F.col("lat")).alias("la"), e5_col(F.col("lon")).alias("lo")
    )
    d = e.select(
        "k", "seq",
        (F.col("la") - F.coalesce(F.lag("la").over(w), F.lit(0))).alias("dla"),
        (F.col("lo") - F.coalesce(F.lag("lo").over(w), F.lit(0))).alias("dlo"),
    )
    g = d.select(
        "k", "seq",
        F.concat(chunks_col(zigzag_col(F.col("dla"))),
                 chunks_col(zigzag_col(F.col("dlo")))).alias("grp"),
    )
    agg = g.groupBy("k").agg(
        F.concat_ws(
            "", F.transform(F.array_sort(
                F.collect_list(F.struct("seq", "grp"))), lambda s: s["grp"])
        ).alias("polyline")
    )
    return {r["k"]: r["polyline"] for r in agg.collect()}


def _encode_duckdb(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k BIGINT, seq BIGINT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    q = f"""
    WITH e AS (
      SELECT k, seq, {e5_sql('lat')} AS la, {e5_sql('lon')} AS lo FROM t
    ), d AS (
      SELECT k, seq,
             la - COALESCE(LAG(la) OVER w, 0) AS dla,
             lo - COALESCE(LAG(lo) OVER w, 0) AS dlo
      FROM e WINDOW w AS (PARTITION BY k ORDER BY seq)
    ), g AS (
      SELECT k, seq,
             {chunks_sql(zigzag_sql('dla'))} || {chunks_sql(zigzag_sql('dlo'))} AS grp
      FROM d
    )
    SELECT k, STRING_AGG(grp, '' ORDER BY seq) FROM g GROUP BY k
    """
    return dict(con.execute(q).fetchall())


def test_google_spec_vector(spark):
    rows = [(1, i, la, lo) for i, (la, lo) in enumerate(GOOGLE_POINTS, 1)]
    assert _encode_duckdb(rows)[1] == GOOGLE_ENCODED
    assert _encode_spark(spark, rows)[1] == GOOGLE_ENCODED


def test_twin_parity_and_roundtrip(spark):
    import random

    rng = random.Random(77)
    rows = []
    want = {}
    for k in (1, 2, 3):
        pts = []
        lat, lon = 47.0, 11.0
        for s in range(1, 60):
            lat += (rng.random() - 0.5) * 0.02
            lon += (rng.random() - 0.5) * 0.02
            rows.append((k, s, lat, lon))
            pts.append((lat, lon))
        want[k] = pts
    spark_out = _encode_spark(spark, rows)
    duck_out = _encode_duckdb(rows)
    assert spark_out == duck_out
    for k, pts in want.items():
        dec = decode_polyline(spark_out[k])
        assert len(dec) == len(pts)
        for (gla, glo), (wla, wlo) in zip(dec, pts):
            assert abs(gla - wla) <= 5.1e-6 and abs(glo - wlo) <= 5.1e-6


def test_extreme_deltas():
    # antipodal jumps: the largest deltas the format can see at 1e-5
    rows = [(1, 1, -89.99999, -179.99999), (1, 2, 89.99999, 179.99999),
            (1, 3, -89.99999, -179.99999)]
    enc = _encode_duckdb(rows)[1]
    dec = decode_polyline(enc)
    for (gla, glo), (_, _, wla, wlo) in zip(dec, rows):
        assert abs(gla - wla) <= 5.1e-6 and abs(glo - wlo) <= 5.1e-6
