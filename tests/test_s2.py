"""S2 cell family (functions/s2.py) — four-tier parity + structural
invariants that any wrong Hilbert table entry would break."""

import math
import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from activity_files_spark.functions.s2 import (
    IJ_TO_POS,
    POS_TO_IJ,
    POS_TO_ORIENT,
    s2_cellid_from_face_ij_py,
    s2_cellid_np,
    s2_cellid_py,
    s2_cellid_to_face_ij_py,
    s2_face_uv_py,
    s2_parent,
    s2_signed,
    s2_sql_ctes,
    s2_token,
    s2_token_col,
    s2_token_sql,
    with_s2_cellid,
)

LOOKUP_BITS = 4


def _build_cpp_lookup():
    """Independently-coded variant of the C++ 4-bit lookup-table algorithm
    (s2cell_id.cc InitLookupCell): the table is built by RECURSION over
    POS_TO_IJ, the encode walks 4 levels at a time — a different code path
    from the 2-bit walk under test."""
    lookup_pos = [0] * (1 << (2 * LOOKUP_BITS + 2))

    def init(level, i, j, orig_o, o, pos):
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_o] = (pos << 2) + o
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = POS_TO_IJ[o]
        for idx in range(4):
            init(
                level,
                i + (r[idx] >> 1),
                j + (r[idx] & 1),
                orig_o,
                o ^ POS_TO_ORIENT[idx],
                pos + idx,
            )

    for o in range(4):
        init(0, 0, 0, o, o, 0)
    return lookup_pos


def _cellid30_cpp(face, i, j, lookup_pos):
    n = face << 60
    bits = face & 1
    for k in range(7, -1, -1):
        mask = (1 << LOOKUP_BITS) - 1
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = lookup_pos[bits]
        n |= (bits >> 2) << (k * 2 * LOOKUP_BITS)
        bits &= 3
    return n * 2 + 1


def test_walk_matches_cpp_lookup_algorithm():
    lookup_pos = _build_cpp_lookup()
    rng = random.Random(7)
    for _ in range(2000):
        f = rng.randrange(6)
        i = rng.randrange(1 << 30)
        j = rng.randrange(1 << 30)
        assert s2_cellid_from_face_ij_py(f, i, j, 30) == _cellid30_cpp(
            f, i, j, lookup_pos
        )


def test_hilbert_continuity_and_roundtrip():
    level = 5
    for face in range(6):
        prev = None
        for pos in range(4**level):
            cid = ((face << (2 * level) | pos) << (61 - 2 * level)) | (
                1 << (60 - 2 * level)
            )
            f, i, j = s2_cellid_to_face_ij_py(cid, level)
            assert f == face
            assert s2_cellid_from_face_ij_py(face, i, j, level) == cid
            if prev is not None:
                # consecutive curve positions are edge-adjacent cells
                assert abs(i - prev[0]) + abs(j - prev[1]) == 1
            prev = (i, j)


def test_level0_face_anchors_and_centers():
    for f in range(6):
        assert s2_cellid_from_face_ij_py(f, 0, 0, 1) >> 61 == f
    for (lat, lon), expf in [
        ((0, 0), 0),
        ((0, 90), 1),
        ((90, 0), 2),
        ((0, 180), 3),
        ((0, -90), 4),
        ((-90, 0), 5),
    ]:
        face, u, v = s2_face_uv_py(lat, lon)
        assert face == expf
        assert abs(u) < 1e-15 and abs(v) < 1e-15
        # face centers land on the center boundary: trig noise of ~1e-17
        # puts u/v either side of 0, so i/j is 2^(L-1)-1 or 2^(L-1)
        cid = s2_cellid_py(lat, lon, 8)
        _, i, j = s2_cellid_to_face_ij_py(cid, 8)
        assert i in (127, 128) and j in (127, 128)


def test_parent_prefix_property():
    rng = random.Random(11)
    for _ in range(500):
        lat = rng.uniform(-89.9, 89.9)
        lon = rng.uniform(-180.0, 180.0)
        child = s2_cellid_py(lat, lon, 14)
        for pl in (13, 10, 4):
            assert s2_parent(child, 14, pl) == s2_cellid_py(lat, lon, pl)


def test_token_roundtrip():
    rng = random.Random(13)
    for _ in range(200):
        cid = s2_cellid_py(rng.uniform(-89, 89), rng.uniform(-180, 180), 12)
        tok = s2_token(cid)
        assert 1 <= len(tok) <= 16
        assert int(tok.ljust(16, "0"), 16) == cid


def test_np_libm_matches_py():
    rng = random.Random(17)
    lats = np.array([rng.uniform(-89.99, 89.99) for _ in range(3000)])
    lons = np.array([rng.uniform(-180.0, 180.0) for _ in range(3000)])
    for level in (8, 12, 16, 30):
        got = s2_cellid_np(lats, lons, level, trig="libm")
        exp = np.array(
            [s2_signed(s2_cellid_py(a, b, level)) for a, b in zip(lats, lons)],
            dtype=np.int64,
        )
        assert (got == exp).all()


def test_np_simd_close_to_libm():
    """The SIMD fast path may flip a cell only at boundaries; on random
    points the ids agree almost everywhere and any disagreement is an
    adjacent leaf index."""
    rng = random.Random(19)
    lats = np.array([rng.uniform(-89.99, 89.99) for _ in range(3000)])
    lons = np.array([rng.uniform(-180.0, 180.0) for _ in range(3000)])
    a = s2_cellid_np(lats, lons, 12, trig="libm")
    b = s2_cellid_np(lats, lons, 12, trig="np")
    diff = a != b
    assert diff.mean() < 0.01
    for idx in np.flatnonzero(diff):
        fa, ia, ja = s2_cellid_to_face_ij_py(int(a[idx]) & ((1 << 64) - 1), 12)
        fb, ib, jb = s2_cellid_to_face_ij_py(int(b[idx]) & ((1 << 64) - 1), 12)
        assert fa == fb and abs(ia - ib) + abs(ja - jb) <= 1


def test_sql_tier_matches_py():
    rng = random.Random(23)
    rows = [
        (k, rng.uniform(-89.99, 89.99), rng.uniform(-180.0, 180.0))
        for k in range(4000)
    ]
    df = pd.DataFrame(rows, columns=["k", "lat", "lon"])
    for level in (6, 12):
        ctes, final = s2_sql_ctes("lat", "lon", level, "k", "df")
        got = (
            duckdb.sql(f"WITH {ctes} SELECT k, s2_id FROM {final} ORDER BY k")
            .df()["s2_id"]
            .to_numpy()
        )
        exp = np.array(
            [s2_signed(s2_cellid_py(lat, lon, level)) for _, lat, lon in rows],
            dtype=np.int64,
        )
        assert (got == exp).all()
    # token twin
    ctes, final = s2_sql_ctes("lat", "lon", 12, "k", "df")
    toks = (
        duckdb.sql(
            f"WITH {ctes} SELECT k, {s2_token_sql('s2_id')} AS tok "
            f"FROM {final} ORDER BY k"
        )
        .df()["tok"]
        .tolist()
    )
    for (_, lat, lon), tok in zip(rows, toks):
        assert tok == s2_token(s2_cellid_py(lat, lon, 12))


def test_column_tier_matches_py_on_grid(spark):
    """JVM trig can differ from libm by 1 ulp; on this fixed grid any
    disagreement must be a boundary-adjacent cell (and there are at most a
    handful)."""
    pts = [
        (k, 40.0 + (k % 97) * 0.013, -105.0 - (k % 89) * 0.017)
        for k in range(2000)
    ]
    sdf = spark.createDataFrame(pts, "k long, lat double, lon double")
    out = with_s2_cellid(sdf, "lat", "lon", 12, out="s2_id")
    got = {
        r["k"]: r["s2_id"]
        for r in out.select("k", "s2_id", s2_token_col(out["s2_id"]).alias("tok")).collect()
    }
    toks = {
        r["k"]: r["tok"]
        for r in out.select("k", s2_token_col(out["s2_id"]).alias("tok")).collect()
    }
    mismatch = 0
    for k, lat, lon in pts:
        exp = s2_cellid_py(lat, lon, 12)
        if got[k] != s2_signed(exp):
            mismatch += 1
            fa, ia, ja = s2_cellid_to_face_ij_py(int(got[k]) & ((1 << 64) - 1), 12)
            fb, ib, jb = s2_cellid_to_face_ij_py(exp, 12)
            assert fa == fb and abs(ia - ib) + abs(ja - jb) <= 1
        else:
            assert toks[k] == s2_token(exp)
    assert mismatch <= 5


def test_column_tier_plan_is_pure_codegen(spark):
    sdf = spark.range(100).selectExpr(
        "id as k", "40.0 + id * 0.001 as lat", "-105.0 - id * 0.001 as lon"
    )
    out = with_s2_cellid(sdf, "lat", "lon", 12)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


def test_level_bounds():
    with pytest.raises(ValueError):
        s2_cellid_py(0.0, 0.0, 0)
    with pytest.raises(ValueError):
        s2_cellid_py(0.0, 0.0, 31)
    with pytest.raises(ValueError):
        s2_parent(s2_cellid_py(1.0, 2.0, 10), 10, 11)


def test_poles_and_antimeridian():
    for lat, lon in [(90.0, 0.0), (-90.0, 0.0), (90.0, 123.0), (0.0, 180.0), (0.0, -180.0)]:
        cid = s2_cellid_py(lat, lon, 20)
        assert cid & 1 == 0 or cid >> 61 <= 5  # well-formed
        f, i, j = s2_cellid_to_face_ij_py(cid, 20)
        assert 0 <= f <= 5 and 0 <= i < (1 << 20) and 0 <= j < (1 << 20)
        # id arithmetic: trailing marker bit at the right position
        assert cid & ((1 << (60 - 2 * 20)) - 1) == 0
        assert (cid >> (60 - 2 * 20)) & 1 == 1
