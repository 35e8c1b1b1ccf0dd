"""Structured Streaming operators (§2.9).

The reference has no true incremental streaming — its "stream" inputs are
chunk-buffered to completion before parsing (activity_parser.dart:84-119).
The engine therefore treats streaming as a first-class NEW capability:
the batch sessionization operators (F6 gap-split, A6 distance splits) map
onto event-time session windows with watermarked state.

- :func:`stream_sessionize` — session_window(ts, gap) aggregation with a
  watermark for late data: the streaming twin of
  operators.windows.sessionize_gap.
- :func:`stream_cell_histogram` — incremental per-cell tiling rollup
  (update-mode groupBy on the quadkey cell), the streaming twin of the
  flagship tiling histogram.
- :func:`stream_from_parquet_dir` — file-source ingest with a fixed schema
  (maxFilesPerTrigger caps ~ the reference's 64 MB payload cap).

Tests drive these with trigger(availableNow=True) into a memory sink —
real incremental execution, bounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activity_files_spark.functions.quadkey import cell_id_col


def stream_from_parquet_dir(
    spark: SparkSession, path: str, schema: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
    ts: str = "ts",
    exact_sum: bool = False,
) -> DataFrame:
    """Event-time session windows with late-data watermark.

    Output (append mode once a session closes): key, session_start,
    session_end, n_events, sum_value. ``exact_sum`` routes the value sum
    through DECIMAL (order-independent — bit-identical to a batch oracle
    regardless of micro-batch boundaries).
    """
    val = F.col("value").cast("decimal(22,6)") if exact_sum else F.col("value")
    total = F.sum(val)
    if exact_sum:
        total = total.cast("double")
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("sw"), F.col(key))
        .agg(F.count("*").alias("n_events"), total.alias("sum_value"))
        .select(
            key,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_cell_histogram(
    points: DataFrame,
    z: int = 12,
    watermark: str = "1 hour",
    ts: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Incremental tiling rollup: per (window, cell) point counts."""
    return (
        points.withWatermark(ts, watermark)
        .withColumn("cell_id", cell_id_col(F.col(lat), F.col(lon), z))
        .groupBy(F.window(F.col(ts), "1 hour").alias("w"), F.col("cell_id"))
        .agg(F.count("*").alias("n_points"))
        .select(F.col("w.start").alias("window_start"), "cell_id", "n_points")
    )


def stream_downsample_time(
    points: DataFrame,
    step_s: float,
    key: str = "activity_id",
    ts: str = "ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W7 downsample-time as a CUSTOM STATEFUL streaming operator
    (applyInPandasWithState): keep a row iff >= step_s since the last KEPT
    row of the same activity — the keep decision crosses micro-batch
    boundaries through per-key state (last kept epoch-microseconds).

    Deterministic and oracle-replayable: within a micro-batch the group's
    chunks are concatenated and sorted by (ts, *tiebreak) before the scan,
    and timestamps compare as EXACT integer microseconds (state holds µs in
    a double — exact to 2^53), so a SQL twin reproduces every keep decision
    bit-for-bit. The scan itself is O(kept · log n) via searchsorted, not a
    per-row Python loop.

    Divergence from the batch twin (operators/downsample.py): a stream has
    no "final point", so the reference's always-keep-last rule does not
    apply; everything else matches.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = points.schema
    # Field renamed last_kept -> last_kept_us when the stored unit changed
    # from epoch-seconds to epoch-microseconds: a restart from a pre-change
    # checkpoint must fail on the schema mismatch rather than silently
    # misinterpret seconds as microseconds. (No deployed checkpoints exist
    # for this framework; the rename is the compatibility fence.)
    state_schema = "last_kept_us double"
    step_us = int(round(step_s * 1e6))
    order = [ts] + list(tiebreak or [])

    def fn(key_tuple, pdf_iter, state):
        last = int(state.get[0]) if state.exists else None
        chunks = [c for c in pdf_iter if len(c)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(order, kind="stable").reset_index(drop=True)
            t = pdf[ts].values.astype("datetime64[us]").astype("int64")
            n = len(t)
            if step_us <= 0:  # degenerate step keeps everything
                if n:
                    last = int(t[-1])
                    yield pdf
                if last is not None:
                    state.update((float(last),))
                return
            keep = []
            i = 0 if last is None else int(np.searchsorted(t, last + step_us, side="left"))
            while i < n:
                keep.append(i)
                last = int(t[i])
                i = int(np.searchsorted(t, last + step_us, side="left"))
            if keep:
                yield pdf.iloc[keep]
        if last is not None:
            state.update((float(last),))

    return points.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_cell_cover(
    points: DataFrame,
    q: int = 8,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: list[str] | None = None,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Segment supercover (operators/supercover.py) as a CUSTOM STATEFUL
    streaming operator: per-key state carries the LAST trajectory point, so
    segments spanning micro-batch boundaries are covered exactly once and
    the emitted cell multiset dedups to the SAME set as the batch operator
    — the cover of a polyline is the union of the covers of sub-polylines
    sharing boundary points, so the result is invariant to how the stream
    is chunked (the driver gate replays the BATCH oracle verbatim).

    Matches the batch twin's edge semantics: a key's first-ever point only
    seeds the state (the batch query drops the lagless row), so a
    single-point key emits nothing. Emits (key, cx, cy) with possible
    duplicates across batches; callers dedup in their rollup exactly like
    the batch path's dropDuplicates.

    The per-segment enumeration here is the python golden twin — the
    pure-Column batch operator is the corpus-scale path; this form exists
    for incremental pipelines where state correctness across chunk
    boundaries is the hard part being proven.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from activity_files_spark.operators.supercover import _cover_cells_np

    key_type = points.schema[key].dataType.simpleString()
    out_schema = f"{key} {key_type}, cx long, cy long"
    state_schema = "last_x long, last_y long"
    order = [ts] + list(tiebreak or [])

    def fn(key_tuple, pdf_iter, state):
        last = tuple(int(v) for v in state.get) if state.exists else None
        chunks = [c for c in pdf_iter if len(c)]
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(order, kind="stable").reset_index(drop=True)
        xs = pdf[x].to_numpy(np.int64)
        ys = pdf[y].to_numpy(np.int64)
        if last is not None:
            xs = np.concatenate(([last[0]], xs))
            ys = np.concatenate(([last[1]], ys))
        state.update((int(xs[-1]), int(ys[-1])))
        if len(xs) < 2:
            return
        # vectorized int64 enumeration (the tested twin of the per-segment
        # python walk, r06); union across segments = sorted unique cells
        _, cx, cy = _cover_cells_np(xs[:-1], ys[:-1], xs[1:], ys[1:], q)
        if len(cx) == 0:
            return
        o = np.lexsort((cy, cx))
        cx, cy = cx[o], cy[o]
        keep = np.empty(len(cx), dtype=bool)
        keep[:1] = True
        keep[1:] = (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])
        cx, cy = cx[keep], cy[keep]
        yield pd.DataFrame(
            {
                key: [key_tuple[0]] * len(cx),
                "cx": cx,
                "cy": cy,
            }
        )

    return points.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
):
    """Drain the bounded stream into a memory sink; returns the query.

    ``complete`` is the right mode for session-window aggregations under
    availableNow (append would hold rows until the watermark passes — which
    never happens after the final batch of a bounded run — and Spark rejects
    update mode for session windows).
    """
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
