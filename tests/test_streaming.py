"""Structured Streaming: session-window sessionization and incremental
cell-histogram tiling, driven end-to-end with availableNow triggers and
compared against the batch twins."""

import os

import pytest
from pyspark.sql import functions as F

from activity_files_spark.operators.windows import sessionize_gap
from activity_files_spark.streaming.stream_ops import (
    run_available_now,
    stream_cell_histogram,
    stream_from_parquet_dir,
    stream_sessionize,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # stage the driver events table as a streaming file source (2 files)
    import shutil

    d = tmp_path_factory.mktemp("stream_src")
    src = "/root/testdata/sf0.001/events.parquet"
    shutil.copy(src, d / "part-000.parquet")
    return str(d)


def test_stream_sessionize_matches_batch(spark, events_dir, tmp_path):
    stream = stream_from_parquet_dir(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
    sess = stream_sessionize(stream, gap="30 minutes", watermark="1 hour")
    q = run_available_now(sess, "sess_test", str(tmp_path / "ckpt"), output_mode="complete")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_test").collect()
    batch = spark.read.parquet(events_dir)
    bs = sessionize_gap(batch, gap_s=1800.0, key="user_id", ts="ts")
    batch_sessions = (
        bs.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("s"))
        .collect()
    )
    batch_map = {(r["user_id"], str(r["s"])): r["n_events"] for r in batch_sessions}
    stream_map = {(r["user_id"], str(r["session_start"])): r["n_events"] for r in got}
    assert stream_map == batch_map
    assert sum(stream_map.values()) == batch.count()


def test_stream_cell_histogram(spark, events_dir, tmp_path):
    stream = stream_from_parquet_dir(spark, events_dir, EVENTS_SCHEMA).select(
        "ts",
        (F.lit(40.0) + (F.col("event_id") % 1000).cast("double") * F.lit(0.0005)).alias("lat"),
        (F.lit(-105.0) - (F.col("event_id") % 997).cast("double") * F.lit(0.0005)).alias("lon"),
    )
    hist = stream_cell_histogram(stream, z=10)
    q = run_available_now(hist, "hist_test", str(tmp_path / "ckpt2"), output_mode="complete")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hist_test").collect()
    total = sum(r["n_points"] for r in got)
    assert total == spark.read.parquet(events_dir).count()


def test_stream_downsample_state_crosses_batches(spark, tmp_path):
    """applyInPandasWithState: the last-kept timestamp survives across
    micro-batches (file 2's first point is suppressed by file 1's state)."""
    from datetime import datetime, timedelta

    from activity_files_spark.streaming.stream_ops import stream_downsample_time

    t0 = datetime(2024, 3, 1, 10, 0, 0)
    schema = "activity_id string, seq long, ts timestamp, lat double, lon double"
    rows_a = [("a", i, t0 + timedelta(seconds=i), 40.0, -105.0) for i in range(0, 51, 10)]
    rows_b = [("a", 100 + i, t0 + timedelta(seconds=52 + i), 40.0, -105.0) for i in (0, 8, 18, 28)]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(rows_b, schema).coalesce(1).write.parquet(str(src / "f2"))
    # stage as two files in one dir, processed one per trigger
    import glob
    import shutil

    d = tmp_path / "stream_in"
    d.mkdir()
    shutil.copy(glob.glob(str(src / "f1" / "part-*.parquet"))[0], d / "0001.parquet")
    shutil.copy(glob.glob(str(src / "f2" / "part-*.parquet"))[0], d / "0002.parquet")

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d))
    ds = stream_downsample_time(stream, step_s=15.0)
    q = (
        ds.writeStream.format("memory").queryName("ds_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(r["seq"] for r in spark.sql("SELECT * FROM ds_test").collect())
    # batch A (t=0..50 step 10): keep 0, 20, 40 (state: 40)
    # batch B (t=52,60,70,80): 52 dropped (d12 from 40), keep 60, 70 dropped, keep 80
    assert kept == [0, 20, 40, 108, 128]


def test_stream_cell_cover_state_crosses_batches(spark, tmp_path):
    """The supercover streaming twin covers the boundary-spanning segment
    exactly once and reproduces the batch operator's cell set under forced
    one-file-per-trigger chunking."""
    from datetime import datetime, timedelta

    from activity_files_spark.operators.supercover import segment_cell_cover_py
    from activity_files_spark.streaming.stream_ops import stream_cell_cover

    t0 = datetime(2024, 3, 1, 10, 0, 0)
    schema = "user_id long, seq long, ts timestamp, x long, y long"
    # a zig-zag track split mid-segment across the two files
    pts = [(0, 0), (40, 5), (90, 60), (95, 200), (10, 210), (300, 320)]
    rows = [
        (7, i, t0 + timedelta(seconds=i), px, py) for i, (px, py) in enumerate(pts)
    ]
    import glob
    import shutil

    d = tmp_path / "cov_in"
    d.mkdir()
    for part, chunk in enumerate((rows[:3], rows[3:])):
        tmp = tmp_path / f"cov_{part}"
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(str(tmp))
        shutil.copy(
            glob.glob(str(tmp / "part-*.parquet"))[0], d / f"{part:04d}.parquet"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    cov = stream_cell_cover(stream, q=4, key="user_id", ts="ts", tiebreak=["seq"])
    q = (
        cov.writeStream.format("memory").queryName("cov_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cov_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["cx"], r["cy"])
        for r in spark.sql("SELECT DISTINCT cx, cy FROM cov_test").collect()
    }
    exp = set()
    for (ax, ay), (bx, by) in zip(pts, pts[1:]):
        exp |= segment_cell_cover_py(ax, ay, bx, by, q=4)
    assert got == exp
