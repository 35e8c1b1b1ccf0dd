"""Relational k-means: recovers planted well-separated clusters, matches a
pure-python replay of the same decimal-pinned algorithm, and is invariant
to input partitioning (the exact-arithmetic claim)."""

import decimal

import pytest
from pyspark.sql import Row

from activity_files_spark.operators.clustering import kmeans_relational

DIM = 8


def _planted(n_per=20, centers=((0.0,) * DIM, (10.0,) * DIM, (-10.0,) + (5.0,) * (DIM - 1))):
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for j in range(n_per):
            vec = [c[d] + ((vid * 31 + d * 7) % 13) * 0.01 for d in range(DIM)]
            rows.append((vid, [float(v) for v in vec], ci))
            vid += 1
    return rows


def _kmeans_py(rows, k, iters):
    """Pure-python replay of the decimal-pinned algorithm."""
    D = decimal.Decimal
    pts = {r[0]: [float(x) for x in r[1]] for r in rows}
    seeds = sorted(pts)[:k]
    cent = {s: list(pts[s]) for s in seeds}

    def rnd(x, n=12):
        return D(str(round(x, n)))

    assign = None
    for _ in range(iters):
        assign = {}
        for pid, x in pts.items():
            best = None
            for cl in sorted(cent):
                dist = sum((rnd((x[d] - cent[cl][d]) ** 2) for d in range(DIM)), D(0))
                kkey = (dist, cl)
                if best is None or kkey < best[0]:
                    best = (kkey, cl)
            assign[pid] = best[1]
        newc = {}
        for cl in set(assign.values()):
            members = [pid for pid, c in assign.items() if c == cl]
            newc[cl] = [
                float(sum((rnd(pts[pid][d]) for pid in members), D(0))) / len(members)
                for d in range(DIM)
            ]
        cent = newc
    out = {}
    for cl in set(assign.values()):
        n = sum(1 for c in assign.values() if c == cl)
        norm = float(sum((rnd(cent[cl][d] ** 2) for d in range(DIM)), D(0))) ** 0.5
        out[cl] = (n, round(norm, 9))
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=r[0], embedding=r[1], label=r[2]) for r in rows]
    )


def test_kmeans_recovers_planted_clusters(spark):
    rows = _planted()
    out = kmeans_relational(_df(spark, rows), k=3, iters=3, dim=DIM).collect()
    got = {r["cluster"]: (r["n_members"], r["centroid_norm"]) for r in out}
    # seeds 0,1,2 all come from planted cluster 0; after the first update
    # the separation is so large that Lloyd's still splits by... it cannot:
    # all seeds sit in one blob, so at least verify the python replay
    # agrees EXACTLY (algorithmic parity is the contract; recovery quality
    # is data-dependent with deterministic seeding)
    assert got == _kmeans_py(rows, 3, 3)


def test_kmeans_spread_seeds_recover_exactly(spark):
    # reorder ids so the 3 smallest ids land in 3 DIFFERENT blobs -> Lloyd
    # must recover the planted partition perfectly
    rows = _planted()
    remap = {}
    for vid, vec, lab in rows:
        nid = lab + 3 * (vid % 20) * 3 + (vid // 60)  # 0,1,2 in distinct blobs
        remap[vid] = (lab + (vid % 20) * 3, vec, lab)
    rows2 = list(remap.values())
    out = kmeans_relational(_df(spark, rows2), k=3, iters=2, dim=DIM).collect()
    sizes = sorted(r["n_members"] for r in out)
    assert sizes == [20, 20, 20]
    assert {r["cluster"]: (r["n_members"], r["centroid_norm"]) for r in out} \
        == _kmeans_py(rows2, 3, 2)


def test_kmeans_partitioning_invariant(spark):
    rows = _planted(n_per=15)
    df = _df(spark, rows)
    a = {
        r["cluster"]: (r["n_members"], r["centroid_norm"])
        for r in kmeans_relational(df.repartition(1), 3, 2, DIM).collect()
    }
    b = {
        r["cluster"]: (r["n_members"], r["centroid_norm"])
        for r in kmeans_relational(df.repartition(13), 3, 2, DIM).collect()
    }
    assert a == b
