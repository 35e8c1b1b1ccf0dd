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
