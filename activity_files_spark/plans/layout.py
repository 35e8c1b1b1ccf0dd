"""Physical layout helpers for 100 TB-scale co-location.

- :func:`write_bucketed` — bucketed saveAsTable on a join key: two tables
  bucketed identically join WITHOUT a shuffle on either side (the 100 TB
  path for points⋈channels and points⋈tiles joins).
- :func:`write_cell_partitioned` — directory-partitioned parquet by
  (zoom, cell prefix): readers filtering on cell prefixes get partition
  pruning for free.

At cluster scale these become Iceberg table layouts; the local tests prove
the shuffle elimination via the executed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32, sort_by: str | None = None
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def write_cell_partitioned(
    df: DataFrame, path: str, z_col: str = "zoom", cell_col: str = "cell_id",
    prefix_bits: int = 8,
) -> None:
    """Partition directories by zoom + high bits of the cell id (bounded
    cardinality); the full cell id remains a column for exact filters."""
    out = df.withColumn("_cell_prefix", F.shiftright(F.col(cell_col), prefix_bits))
    out.write.mode("overwrite").partitionBy(z_col, "_cell_prefix").parquet(path)
