"""Deterministic sampling + dataset splitting — the two selection verbs
every training-data pipeline runs before anything else (downsample a
10^12-row corpus to a working set; carve train/val/test without leakage),
here as PURE relational arithmetic on the sketch module's 61-bit mix
hash, so both verbs are

- **deterministic**: a row's fate is a function of its id alone — stable
  under re-runs, partitioning changes, retries, and cluster sizes (the
  property `df.sample()` does NOT give you, being seed+partition
  dependent);
- **oracle-exact**: the DuckDB twin replays the same integer hash, so a
  driver gate hash-matches the SELECTED SET, not just its size;
- **leak-free by construction**: the same id always lands in the same
  split, and ids never straddle splits (the classic train/test leak when
  sampling is re-run per table instead of keyed on the join id).

Scale shape: the hash is whole-stage-codegen'd Column arithmetic; the
top-k sample is one per-key window over a hash-ordered frame (shuffle =
the groups, exactly like any per-key ranking); the split is a pure map —
no shuffle at all until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from activity_files_spark.operators.sketch import _mix_sql, mix_chain as _mix_chain


def deterministic_sample(
    df: DataFrame, key: str, id_col: str, k: int
) -> DataFrame:
    """Per-key deterministic uniform sample: the ``k`` rows whose mixed id
    hashes rank smallest within the key (ties broken by the id itself, so
    the selection is a total order). Re-running on any partitioning
    selects the SAME rows. Returns the input columns + ``sample_rank``
    (1-based)."""
    if k <= 0:
        raise ValueError(f"k must be positive (got {k})")
    hashed = _mix_chain(df, df.columns, id_col, "_hash")
    w = Window.partitionBy(key).orderBy("_hash", id_col)
    return (
        hashed.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .drop("_hash")
    )


def deterministic_sample_sql(
    src_cte: str, key: str, id_col: str, k: int, cols: str = "*"
) -> str:
    """DuckDB twin of :func:`deterministic_sample`: binds ``ds_out``."""
    h = _mix_sql(f"CAST({id_col} AS BIGINT)")
    return f"""
    ds_hashed AS (
      SELECT {cols}, {h} AS hash FROM {src_cte}
    ),
    ds_out AS (
      SELECT * EXCLUDE (hash) FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY {key} ORDER BY hash, {id_col}) AS sample_rank
        FROM ds_hashed
      ) t WHERE sample_rank <= {k}
    )
    """


def dataset_split(
    df: DataFrame,
    id_col: str,
    fracs: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
) -> DataFrame:
    """Leak-free train/val/test assignment: ``split`` is a pure function
    of the id's mix hash modulo 10_000 against cumulative fraction
    boundaries — the same id lands in the same split on every run, table,
    and cluster. Appends a ``split`` string column; fractions must sum to
    1 (to one-basis-point tolerance, the boundary resolution)."""
    if len(fracs) != len(names):
        raise ValueError("fracs and names must align")
    if abs(sum(fracs) - 1.0) > 1e-4:
        raise ValueError(f"fractions sum to {sum(fracs)}, expected 1")
    bounds = []
    acc = 0.0
    for f_ in fracs[:-1]:
        acc += f_
        bounds.append(int(round(acc * 10000)))
    hashed = _mix_chain(df, df.columns, id_col, "_hash")
    bucket = F.col("_hash") % 10000
    expr = F.lit(names[-1])
    for b, name in zip(reversed(bounds), reversed(names[:-1])):
        expr = F.when(bucket < b, F.lit(name)).otherwise(expr)
    return hashed.withColumn("split", expr).drop("_hash")


def dataset_split_sql(
    src_cte: str,
    id_col: str,
    fracs: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`dataset_split`: binds ``sp_out`` with the
    source columns + ``split``."""
    bounds = []
    acc = 0.0
    for f_ in fracs[:-1]:
        acc += f_
        bounds.append(int(round(acc * 10000)))
    h = _mix_sql(f"CAST({id_col} AS BIGINT)")
    case = f"'{names[-1]}'"
    for b, name in zip(reversed(bounds), reversed(names[:-1])):
        case = f"CASE WHEN bucket < {b} THEN '{name}' ELSE {case} END"
    return f"""
    sp_hashed AS (
      SELECT {cols}, ({h}) % 10000 AS bucket FROM {src_cte}
    ),
    sp_out AS (
      SELECT * EXCLUDE (bucket), {case} AS split FROM sp_hashed
    )
    """


__all__ = [
    "deterministic_sample",
    "deterministic_sample_sql",
    "dataset_split",
    "dataset_split_sql",
]
