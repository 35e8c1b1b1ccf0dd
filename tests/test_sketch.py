"""HyperLogLog sketch: cross-engine hash parity, accuracy within the
theoretical error band, merge associativity, and edge cases."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from activity_files_spark.operators.sketch import (
    _MAX_RANK,
    _M_REG,
    _mix_sql,
    hll_distinct,
    hll_distinct_sql,
    hll_estimate_py,
    hll_mix_py,
)


def test_mix_duckdb_matches_scalar():
    ids = [0, 1, 2, 7, 12345, 2**31 - 1, 2**31, 2**40 + 123, 999999999999, 2**61]
    con = duckdb.connect()
    got = [
        r[0]
        for r in con.sql(
            f"SELECT {_mix_sql('CAST(x AS BIGINT)')} AS h "
            f"FROM (SELECT unnest({ids}) AS x)"
        ).fetchall()
    ]
    assert got == [hll_mix_py(x) for x in ids]


def test_mix_stays_in_61_bits_and_spreads():
    hs = [hll_mix_py(i * 7 + 3) for i in range(4096)]
    assert all(0 <= h < (1 << 61) for h in hs)
    # buckets spread: no bucket takes more than 4x its fair share
    buckets = [0] * _M_REG
    for h in hs:
        buckets[h % _M_REG] += 1
    assert max(buckets) <= 4 * (4096 // _M_REG)


@pytest.mark.parametrize("n", [50, 137, 5000, 60000])
def test_scalar_accuracy_within_band(n):
    est = hll_estimate_py([i * 13 + 5 for i in range(n)])
    # 1.04/sqrt(256) = 6.5% standard error; allow 3 sigma
    assert abs(est - n) / n < 3 * 1.04 / math.sqrt(_M_REG)


def test_scalar_linear_counting_small_n():
    # tiny cardinalities take the linear-counting branch and are near-exact
    for n in (1, 5, 20):
        est = hll_estimate_py(range(n))
        assert abs(est - n) <= max(1.0, 0.1 * n)


def test_merge_associativity():
    # max-of-maxes: sketching A ∪ B equals merging sketches of A and B —
    # replayed at the register level with the scalar twin
    from activity_files_spark.operators.sketch import hll_mix_py as mix

    def regs(ids):
        r = [0] * _M_REG
        for x in ids:
            h = mix(int(x))
            v = h // _M_REG
            r[h % _M_REG] = max(r[h % _M_REG], _MAX_RANK - (v.bit_length() if v else 0))
        return r

    a = [i * 3 for i in range(2000)]
    b = [i * 5 + 1 for i in range(3000)]
    merged = [max(x, y) for x, y in zip(regs(a), regs(b))]
    assert merged == regs(a + b)


def test_spark_matches_scalar_and_duckdb(spark):
    df = spark.range(30000).select(
        (F.col("id") % 2).alias("g"),
        ((F.col("id") * 11) % 7919).alias("uid"),
    )
    rows = {r.g: r for r in hll_distinct(df, ["g"], "uid").collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE src AS SELECT (i % 2) AS g, (i * 11) % 7919 AS uid "
        "FROM range(30000) t(i)"
    )
    body = hll_distinct_sql("src", ["g"], "uid")
    for g, n_rows, hit, reg_sum, est in con.sql(
        f"WITH {body} SELECT * FROM hll_out"
    ).fetchall():
        r = rows[g]
        assert (r.n_rows, r.n_buckets_hit, r.reg_sum) == (n_rows, hit, reg_sum)
        assert r.hll_est == est  # bit-equal float across engines
    # and against the scalar twin
    ids = {0: set(), 1: set()}
    for i in range(30000):
        ids[i % 2].add((i * 11) % 7919)
    for g, r in rows.items():
        assert r.hll_est == hll_estimate_py(ids[g])


def test_spark_register_sum_bounds(spark):
    df = spark.range(1000).select(F.lit(0).alias("g"), F.col("id").alias("uid"))
    r = hll_distinct(df, ["g"], "uid").collect()[0]
    # register sum is bounded by [256 (all ranks max) .. 256 * 2^54]
    assert _M_REG <= r.reg_sum <= _M_REG * (1 << _MAX_RANK)
    assert 1 <= r.n_buckets_hit <= _M_REG
    assert r.n_rows == 1000


def test_bloom_no_false_negatives_and_low_fp(spark):
    from activity_files_spark.operators.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame(
        [(i * 7 + 3,) for i in range(2000)], "id long"
    )
    probe = spark.createDataFrame([(i,) for i in range(30000)], "id long")
    filt = bloom_build(members, "id")
    got = {r.id: r.might_contain for r in bloom_probe(probe, filt, "id").collect()}
    member_set = {i * 7 + 3 for i in range(2000)}
    fps = 0
    for i in range(30000):
        if i in member_set:
            assert got[i], f"false negative at {i}"
        elif got[i]:
            fps += 1
    # m/n = 512*63/2000 ≈ 16 bits/member, k=3 -> fp ≈ 0.5%; allow 2%
    assert fps / (30000 - len([i for i in range(30000) if i in member_set])) < 0.02


def test_bloom_merge_is_bitor(spark):
    from pyspark.sql import functions as F

    from activity_files_spark.operators.sketch import bloom_build

    a = spark.createDataFrame([(i,) for i in range(500)], "id long")
    b = spark.createDataFrame([(i,) for i in range(400, 900)], "id long")
    u = spark.createDataFrame([(i,) for i in range(900)], "id long")
    fa = {r.word_idx: r.word for r in bloom_build(a, "id").collect()}
    fb = {r.word_idx: r.word for r in bloom_build(b, "id").collect()}
    fu = {r.word_idx: r.word for r in bloom_build(u, "id").collect()}
    merged = {}
    for w, v in list(fa.items()) + list(fb.items()):
        merged[w] = merged.get(w, 0) | v
    assert merged == fu


def test_bloom_duckdb_twin_filter_is_bit_identical(spark):
    import duckdb

    from activity_files_spark.operators.sketch import bloom_build, bloom_sql

    rows = [(i * 13 + 1,) for i in range(1500)]
    members = spark.createDataFrame(rows, "id long")
    got = {r.word_idx: r.word for r in bloom_build(members, "id").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE m (id BIGINT)")
    con.executemany("INSERT INTO m VALUES (?)", rows)
    con.execute("CREATE TABLE p (id BIGINT)")  # unused probe
    con.execute("INSERT INTO p VALUES (1)")
    body = bloom_sql("m", "p", "id", "id")
    sql_got = dict(
        con.execute(f"WITH {body} SELECT word_idx, word FROM bl_words").fetchall()
    )
    assert got == sql_got


def test_cms_never_undercounts_and_is_tight(spark):
    from collections import Counter

    from activity_files_spark.operators.sketch import cms_build, cms_estimate

    # zipf-ish stream: key i appears ~3000/(i+1) times
    stream_rows = [(i,) for i in range(60) for _ in range(3000 // (i + 1))]
    truth = Counter(i for (i,) in stream_rows)
    stream = spark.createDataFrame(stream_rows, "id long")
    sketch = cms_build(stream, "id")
    keys = spark.createDataFrame([(i,) for i in range(60)], "id long")
    got = {r.id: r.cms_est for r in cms_estimate(keys, sketch, "id").collect()}
    n = len(stream_rows)
    for i in range(60):
        assert got[i] >= truth[i], f"undercount at {i}"
        # classic CMS bound: overcount <= 2n/w with prob 1-2^-d; be generous
        assert got[i] - truth[i] <= 8 * n / 1024


def test_cms_absent_key_estimates_low(spark):
    from activity_files_spark.operators.sketch import cms_build, cms_estimate

    stream = spark.createDataFrame([(i % 10,) for i in range(1000)], "id long")
    sketch = cms_build(stream, "id")
    keys = spark.createDataFrame([(999999,)], "id long")
    est = cms_estimate(keys, sketch, "id").collect()[0].cms_est
    assert 0 <= est <= 8  # absent keys only collide


def test_cms_merge_is_addition(spark):
    from activity_files_spark.operators.sketch import cms_build

    a = spark.createDataFrame([(i % 7,) for i in range(300)], "id long")
    b = spark.createDataFrame([(i % 5,) for i in range(200)], "id long")
    u = spark.createDataFrame(
        [(i % 7,) for i in range(300)] + [(i % 5,) for i in range(200)], "id long"
    )
    fa = {(r.row, r.pos): r.cnt for r in cms_build(a, "id").collect()}
    fb = {(r.row, r.pos): r.cnt for r in cms_build(b, "id").collect()}
    fu = {(r.row, r.pos): r.cnt for r in cms_build(u, "id").collect()}
    merged = dict(fa)
    for k, v in fb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == fu


def test_cms_duckdb_twin_sketch_and_estimates(spark):
    import duckdb

    from activity_files_spark.operators.sketch import cms_build, cms_estimate, cms_sql

    rows = [(i % 13 * 3,) for i in range(700)]
    stream = spark.createDataFrame(rows, "id long")
    keys = spark.createDataFrame([(i,) for i in range(0, 40)], "id long")
    sketch = cms_build(stream, "id")
    got = sorted(
        (r.id, r.cms_est) for r in cms_estimate(keys, sketch, "id").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE s (id BIGINT)")
    con.executemany("INSERT INTO s VALUES (?)", rows)
    con.execute("CREATE TABLE k (id BIGINT)")
    con.executemany("INSERT INTO k VALUES (?)", [(i,) for i in range(0, 40)])
    body = cms_sql("s", "k", "id", "id")
    sql_got = sorted(
        tuple(r)
        for r in con.execute(f"WITH {body} SELECT id, cms_est FROM cm_est").fetchall()
    )
    assert got == sql_got
