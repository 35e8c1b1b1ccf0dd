"""Moran's I (operators/autocorr.py): integer expansion vs the textbook
float definition, engine twins, and known-pattern sanity."""

import math
import random

import duckdb
import pytest

from activity_files_spark.operators.autocorr import (
    morans_i,
    morans_i_definitional_py,
    morans_i_py,
    morans_i_sql,
)


def _random_raster(seed, w=12, h=9, density=0.7, hi=50):
    rng = random.Random(seed)
    return {
        (cx, cy): rng.randint(1, hi)
        for cx in range(w)
        for cy in range(h)
        if rng.random() < density
    }


def test_integer_expansion_equals_definition():
    for seed in range(8):
        cells = _random_raster(seed)
        got = morans_i_py(cells)["morans_i"]
        want = morans_i_definitional_py(cells)
        assert got == pytest.approx(want, rel=1e-12)


def test_stripes_are_negative_gradient_is_positive():
    # under QUEEN adjacency a checkerboard is near-neutral (the 4 diagonal
    # neighbours agree); vertical stripes are the canonical negative case
    # (6 of 8 neighbours disagree)
    stripes = {
        (cx, cy): 100 if cx % 2 == 0 else 1
        for cx in range(8)
        for cy in range(8)
    }
    assert morans_i_py(stripes)["morans_i"] < -0.3
    gradient = {(cx, cy): 10 * cx + 1 for cx in range(8) for cy in range(8)}
    assert morans_i_py(gradient)["morans_i"] > 0.5


def test_spark_matches_python(spark):
    cells = _random_raster(42)
    df = spark.createDataFrame(
        [(cx, cy, x) for (cx, cy), x in cells.items()],
        "cx long, cy long, x long",
    )
    row = morans_i(df).collect()[0].asDict()
    want = morans_i_py(cells)
    assert row == want  # num/den exact, quotient bit-equal


def test_sql_twin_matches_python():
    cells = _random_raster(77)
    con = duckdb.connect()
    con.execute("CREATE TABLE cells(cx BIGINT, cy BIGINT, x BIGINT)")
    con.executemany(
        "INSERT INTO cells VALUES (?,?,?)",
        [(cx, cy, x) for (cx, cy), x in cells.items()],
    )
    body = morans_i_sql("cells")
    got = con.execute(f"WITH {body} SELECT * FROM morans").fetchdf().iloc[0]
    want = morans_i_py(cells)
    for k, v in want.items():
        assert got[k] == v, k


def test_isolated_cells_have_zero_pairs():
    # cells with no neighbors: W = 0 -> undefined (None), not a crash
    out = morans_i_py({(0, 0): 5, (10, 10): 7})
    assert out["w_pairs"] == 0 and out["morans_i"] is None


def test_gi_star_spark_and_sql_match_python(spark):
    from activity_files_spark.operators.autocorr import (
        getis_ord_gi_star,
        getis_ord_gi_star_py,
        getis_ord_gi_star_sql,
    )

    cells = _random_raster(101)
    want = getis_ord_gi_star_py(cells)
    df = spark.createDataFrame(
        [(cx, cy, x) for (cx, cy), x in cells.items()],
        "cx long, cy long, x long",
    )
    got = {
        (r["cx"], r["cy"]): (r["x"], r["g_i"], r["w_i"], r["num"], r["z"])
        for r in getis_ord_gi_star(df).collect()
    }
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE cells(cx BIGINT, cy BIGINT, x BIGINT)")
    con.executemany(
        "INSERT INTO cells VALUES (?,?,?)",
        [(cx, cy, x) for (cx, cy), x in cells.items()],
    )
    body = getis_ord_gi_star_sql("cells")
    rows = con.execute(f"WITH {body} SELECT * FROM gistar").fetchall()
    got_sql = {(r[0], r[1]): (r[2], r[3], r[4], r[5], r[6]) for r in rows}
    assert got_sql == want


def test_gi_star_hotspot_sign():
    from activity_files_spark.operators.autocorr import getis_ord_gi_star_py

    # one hot 3x3 blob in a cold field: blob center must be the max z
    cells = {(cx, cy): 1 for cx in range(10) for cy in range(10)}
    for cx in range(4, 7):
        for cy in range(4, 7):
            cells[(cx, cy)] = 50
    out = getis_ord_gi_star_py(cells)
    best = max(out, key=lambda k: out[k][4])
    assert best == (5, 5)
    assert out[(5, 5)][4] > 2.0
    assert out[(0, 0)][4] < 0.0


def test_gi_star_bucketed_equals_per_bucket(spark):
    from activity_files_spark.operators.autocorr import (
        getis_ord_gi_star,
        getis_ord_gi_star_py,
        getis_ord_gi_star_sql,
    )

    buckets = {b: _random_raster(200 + b, w=8, h=6) for b in (0, 1, 2)}
    rows = [
        (b, cx, cy, x)
        for b, cells in buckets.items()
        for (cx, cy), x in cells.items()
    ]
    df = spark.createDataFrame(rows, "bucket long, cx long, cy long, x long")
    got = {
        (r["bucket"], r["cx"], r["cy"]): (r["x"], r["g_i"], r["w_i"], r["num"], r["z"])
        for r in getis_ord_gi_star(df, by=("bucket",)).collect()
    }
    want = {}
    for b, cells in buckets.items():
        for (cx, cy), v in getis_ord_gi_star_py(cells).items():
            want[(b, cx, cy)] = v
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE cells(bucket BIGINT, cx BIGINT, cy BIGINT, x BIGINT)")
    con.executemany("INSERT INTO cells VALUES (?,?,?,?)", rows)
    body = getis_ord_gi_star_sql("cells", by=("bucket",))
    sql_got = {
        (r[0], r[1], r[2]): (r[3], r[4], r[5], r[6], r[7])
        for r in con.execute(f"WITH {body} SELECT * FROM gistar").fetchall()
    }
    assert sql_got == want


def test_mann_kendall(spark):
    from activity_files_spark.operators.autocorr import (
        mann_kendall_py,
        mann_kendall_trend,
    )

    assert mann_kendall_py([1, 2, 3, 4]) == 6
    assert mann_kendall_py([4, 3, 2, 1]) == -6
    assert mann_kendall_py([1, 1, 1]) == 0
    rng = random.Random(5)
    series = {k: [rng.uniform(-2, 2) for _ in range(7)] for k in range(6)}
    rows = [
        (k, t, v) for k, vs in series.items() for t, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "key long, t long, v double")
    got = {
        r["key"]: (r["n_buckets"], r["mk_s"])
        for r in mann_kendall_trend(df, by=("key",), t="t", v="v").collect()
    }
    want = {k: (len(vs), mann_kendall_py(vs)) for k, vs in series.items()}
    assert got == want


def test_theil_sen_scalar_known_values():
    from activity_files_spark.operators.autocorr import theil_sen_py

    # perfect line: slope exactly 2
    assert theil_sen_py([(0, 1.0), (1, 3.0), (2, 5.0), (3, 7.0)]) == 2.0
    # one outlier: median slope stays at 1 (robustness — OLS would not)
    assert theil_sen_py([(0, 0.0), (1, 1.0), (2, 2.0), (3, 100.0), (4, 4.0)]) == 1.0
    # fewer than 2 points: no slope
    assert theil_sen_py([(0, 5.0)]) is None
    assert theil_sen_py([]) is None
    # odd pair count picks the middle slope exactly
    assert theil_sen_py([(0, 0.0), (1, 2.0), (2, 2.0)]) == 1.0
    # even pair count (n=4 -> 6 slopes) averages the two middle slopes
    pts = [(0, 0.0), (1, 3.0), (2, 4.0), (3, 4.5)]
    slopes = sorted(
        (pts[j][1] - pts[i][1]) / (pts[j][0] - pts[i][0])
        for i in range(4)
        for j in range(i + 1, 4)
    )
    assert theil_sen_py(pts) == (slopes[2] + slopes[3]) / 2.0


def test_theil_sen_spark_and_duckdb_match_scalar(spark):
    from activity_files_spark.operators.autocorr import (
        theil_sen_py,
        theil_sen_slope,
        theil_sen_sql,
    )

    rng = random.Random(11)
    series = {}
    for k in range(8):
        n = rng.choice([1, 2, 5, 8, 9])
        ts = sorted(rng.sample(range(30), n))
        series[k] = [(t, rng.uniform(-5, 5)) for t in ts]
    rows = [(k, t, v) for k, pts in series.items() for t, v in pts]
    df = spark.createDataFrame(rows, "key long, t long, v double")
    got = {
        r["key"]: (r["n_buckets"], r["n_pairs"], r["ts_slope"])
        for r in theil_sen_slope(df, by=("key",), t="t", v="v").collect()
    }
    want = {
        k: (
            len(pts),
            len(pts) * (len(pts) - 1) // 2,
            theil_sen_py(pts),
        )
        for k, pts in series.items()
    }
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE scored (key BIGINT, t BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO scored VALUES (?,?,?)", rows)
    body = theil_sen_sql("scored", ("key",), "t", "v")
    sql_got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(f"WITH {body} SELECT * FROM ts_out").fetchall()
    }
    assert sql_got == want
