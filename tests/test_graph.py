"""Connected components: random graphs vs a BFS oracle, long chains
(pointer-jump path), the DuckDB recursive closure twin, and determinism."""

import collections
import random

import duckdb
import pytest

from activity_files_spark.operators.graph import (
    connected_components,
    connected_components_sql,
)


def _bfs_components(edges):
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seen, out = set(), {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            n = stack.pop()
            comp.append(n)
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        root = min(comp)
        for n in comp:
            out[n] = root
    return out


def _random_edges(rng, n_nodes=60, n_edges=50):
    return list({
        tuple(sorted(rng.sample(range(n_nodes), 2)))
        for _ in range(n_edges)
    })


def test_cc_matches_bfs_random(spark):
    rng = random.Random(5)
    edges = _random_edges(rng)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _bfs_components(edges)


def test_cc_long_chain_converges_fast(spark):
    # a 60-node path graph: min-label alone needs 60 rounds; pointer
    # jumping must close it within the max_iter budget
    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df, max_iter=12).collect()}
    assert set(got.values()) == {0} and len(got) == 61


def test_cc_sql_closure_matches_bfs():
    rng = random.Random(9)
    edges = _random_edges(rng, n_nodes=40, n_edges=45)
    con = duckdb.connect()
    con.execute("CREATE TABLE e(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    sql = (
        "WITH RECURSIVE ed AS (SELECT a, b FROM e),\n"
        + connected_components_sql("ed")
        + "\nSELECT node, component FROM cc_labels"
    )
    got = dict(con.sql(sql).fetchall())
    assert got == _bfs_components(edges)


def test_cc_empty_and_self_loop(spark):
    df = spark.createDataFrame([(7, 7)], "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {7: 7}
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
