"""Deterministic sampling + dataset split (operators/sampling.py):
stability under partitioning, cross-engine set equality, split
proportions and leak-freedom."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from activity_files_spark.operators.sampling import (
    dataset_split,
    dataset_split_sql,
    deterministic_sample,
    deterministic_sample_sql,
)
from activity_files_spark.operators.sketch import hll_mix_py


def test_sample_stable_under_partitioning(spark):
    rows = [(i % 7, i) for i in range(2000)]
    df1 = spark.createDataFrame(rows, "key long, id long").repartition(1)
    df2 = spark.createDataFrame(rows, "key long, id long").repartition(16, "id")
    pick = lambda df: sorted(
        (r.key, r.sample_rank, r.id)
        for r in deterministic_sample(df, "key", "id", 3).collect()
    )
    assert pick(df1) == pick(df2)
    assert len(pick(df1)) == 7 * 3


def test_sample_matches_scalar_ranking(spark):
    rows = [(1, i * 13 + 2) for i in range(50)]
    df = spark.createDataFrame(rows, "key long, id long")
    got = [
        r.id
        for r in deterministic_sample(df, "key", "id", 5)
        .orderBy("sample_rank")
        .collect()
    ]
    want = [i for _, i in rows]
    want.sort(key=lambda x: (hll_mix_py(x), x))
    assert got == want[:5]


def test_sample_k_larger_than_group(spark):
    df = spark.createDataFrame([(1, 10), (1, 20)], "key long, id long")
    assert deterministic_sample(df, "key", "id", 99).count() == 2


def test_sample_bad_k(spark):
    df = spark.createDataFrame([(1, 10)], "key long, id long")
    with pytest.raises(ValueError):
        deterministic_sample(df, "key", "id", 0)


def test_sample_duckdb_twin(spark):
    rows = [(i % 5, i * 3) for i in range(500)]
    df = spark.createDataFrame(rows, "key long, id long")
    got = sorted(
        (r.key, r.sample_rank, r.id)
        for r in deterministic_sample(df, "key", "id", 4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE src (key BIGINT, id BIGINT)")
    con.executemany("INSERT INTO src VALUES (?,?)", rows)
    body = deterministic_sample_sql("src", "key", "id", 4, cols="key, id")
    sql_got = sorted(
        (r[0], r[2], r[1])
        for r in con.execute(
            f"WITH {body} SELECT key, id, sample_rank FROM ds_out"
        ).fetchall()
    )
    assert got == sql_got


def test_split_proportions_and_determinism(spark):
    n = 20000
    df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    out = dataset_split(df, "id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.01
    assert abs(counts["test"] / n - 0.1) < 0.01
    # same id -> same split, even from a different table shape
    df2 = spark.createDataFrame([(i, f"x{i}") for i in range(0, n, 7)], "id long, extra string")
    m1 = {r.id: r.split for r in out.collect()}
    for r in dataset_split(df2, "id").collect():
        assert m1[r.id] == r.split  # leak-free: membership is a function of id


def test_split_custom_fracs_and_validation(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    out = dataset_split(df, "id", fracs=(0.5, 0.5), names=("a", "b"))
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"a", "b"}
    with pytest.raises(ValueError):
        dataset_split(df, "id", fracs=(0.5, 0.4), names=("a", "b"))
    with pytest.raises(ValueError):
        dataset_split(df, "id", fracs=(0.5, 0.5), names=("a",))


def test_split_duckdb_twin(spark):
    rows = [(i * 17 + 1,) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long")
    got = sorted((r.id, r.split) for r in dataset_split(df, "id").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE src (id BIGINT)")
    con.executemany("INSERT INTO src VALUES (?)", rows)
    body = dataset_split_sql("src", "id", cols="id")
    sql_got = sorted(
        tuple(r) for r in con.execute(f"WITH {body} SELECT id, split FROM sp_out").fetchall()
    )
    assert got == sql_got
