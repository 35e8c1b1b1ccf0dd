"""operators/grouped.grouped_apply (r06): the whole-partition twin of
groupBy().applyInPandas must reproduce it exactly — including null-key
groups and keys whose rows span multiple Arrow batches — and the r06
vectorized stay-point break index must make the identical radius decisions
as the sequential scalar walk even for distances that straddle the
threshold."""

import pandas as pd
from pyspark.sql import functions as F

from activity_files_spark.operators.grouped import grouped_apply


def _make_kernel():
    # nested so cloudpickle serializes it by value — the tests package is
    # not importable on executor python workers
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("v", kind="stable")
        key = pdf["k"].iloc[0]
        return pd.DataFrame(
            {
                "k": [key],
                "n": [len(pdf)],
                "first_v": [int(pdf["v"].iloc[0])],
                "sum_v": [int(pdf["v"].sum())],
            }
        )

    return kernel


SCHEMA = "k string, n long, first_v long, sum_v long"


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


def test_matches_group_by_apply_in_pandas(spark):
    df = spark.range(5000).select(
        (F.col("id") % 97).cast("string").alias("k"),
        F.col("id").alias("v"),
    )
    via_grouped = grouped_apply(df, "k", _make_kernel(), SCHEMA)
    kern = _make_kernel()

    def two_arg(_k, p):
        return kern(p)

    via_apply = df.groupBy("k").applyInPandas(two_arg, SCHEMA)
    assert _rows(via_grouped) == _rows(via_apply)


def test_null_keys_form_a_group(spark):
    df = spark.range(100).select(
        F.when(F.col("id") % 10 == 0, F.lit(None))
        .otherwise((F.col("id") % 3).cast("string"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    out = {r["k"]: r["n"] for r in grouped_apply(df, "k", _make_kernel(), SCHEMA).collect()}
    # 10 rows have a null key; Spark's groupBy keeps them as one group and
    # so must the pandas twin (dropna=False)
    assert out[None] == 10
    assert sum(out.values()) == 100


def test_key_split_across_arrow_batches(spark):
    # 2 keys x 15k rows: with the default 10k-row Arrow batch size each
    # key's rows necessarily span batches inside its partition — the
    # partition-level concat must re-join them before grouping
    df = spark.range(30000).select(
        (F.col("id") % 2).cast("string").alias("k"),
        F.col("id").alias("v"),
    )
    out = {r["k"]: (r["n"], r["sum_v"]) for r in
           grouped_apply(df, "k", _make_kernel(), SCHEMA).collect()}
    assert out["0"][0] == 15000 and out["1"][0] == 15000
    assert out["0"][1] + out["1"][1] == sum(range(30000))


def test_stay_break_index_at_threshold(spark):
    """The vectorized diagonal-sweep break index (r06) must flip on the
    exact same comparisons as the sequential scalar walk — probed with
    points placed just inside, just outside, and effectively AT the
    120 m radius (sub-ulp margins route through the scalar-libm band)."""
    from activity_files_spark.functions.geo import haversine_m_exact
    from activity_files_spark.operators.trajectory import stay_points

    lat0, lon0 = 47.0, 11.0
    # ~1 deg lat = 111.19 km on this sphere; craft offsets around 120 m
    deg_for = lambda m: m / 111194.92664455873  # noqa: E731
    offsets = [0.0, deg_for(119.999999), deg_for(120.000001), deg_for(50.0),
               deg_for(2000.0), deg_for(2000.0) + deg_for(10.0)]
    rows = [
        (1, i + 1, 100 + i, float((i + 1) * 300), lat0 + off, lon0)
        for i, off in enumerate(offsets)
    ]
    pts = spark.createDataFrame(
        rows, "user_id long, seq long, event_id long, tss double, "
              "lat double, lon double"
    )
    out = stay_points(
        pts, d_max_m=120.0, t_min_s=240.0, key="user_id", seq="seq",
        id_col="event_id", tss="tss", lat="lat", lon="lon",
    ).collect()

    # scalar reference walk (the pre-r06 sequential kernel, inlined)
    la = [r[4] for r in rows]
    lo = [r[5] for r in rows]
    ts = [r[3] for r in rows]
    seqs = [r[1] for r in rows]
    ids = [r[2] for r in rows]
    expect = []
    i, n = 0, len(rows)
    while i < n:
        jeff = n
        for j in range(i + 1, n):
            if haversine_m_exact(la[i], lo[i], la[j], lo[j]) > 120.0:
                jeff = j
                break
        dur = ts[jeff - 1] - ts[i]
        if dur >= 240.0:
            expect.append((1, seqs[i], seqs[jeff - 1], ids[i], ids[jeff - 1],
                           jeff - i, float(dur)))
            i = jeff
        else:
            i += 1
    got = sorted(tuple(r) for r in out)
    assert got == sorted(expect)
    assert expect  # the fixture does produce at least one stay
