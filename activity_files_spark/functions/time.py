"""Timestamp helpers.

Parquet timestamps may arrive as TIMESTAMP_NTZ (Spark 4), which cannot be
cast to double directly; routing through TIMESTAMP_LTZ (session tz is pinned
to UTC in session.py) gives epoch seconds with microsecond fraction — the
same value DuckDB's epoch_us(ts)/1e6 computes.
"""

from __future__ import annotations

from pyspark.sql import Column


def ts_seconds(c: Column) -> Column:
    """Epoch seconds (double, microsecond resolution) from any timestamp type."""
    return c.cast("timestamp_ltz").cast("double")
