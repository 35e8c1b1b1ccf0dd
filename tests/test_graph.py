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


def test_cc_two_round_budget_single_edge(spark):
    # r06 second pass removed the initial label-sum action (round 1 always
    # changes the sum for a nonempty edge set): one change round plus one
    # confirm round must still satisfy the fixpoint detector, so a single
    # edge converges within max_iter=2 instead of raising
    df = spark.createDataFrame([(3, 9)], "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df, max_iter=2).collect()}
    assert got == {3: 3, 9: 3}


# --------------------------------------------------------- shortest paths
def _dijkstra(edges, source):
    """Reference shortest paths: heap Dijkstra over directed (s, d, w)."""
    import heapq

    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        dv, v = heapq.heappop(pq)
        if dv > dist.get(v, float("inf")):
            continue
        for to, w in adj.get(v, ()):
            nd = dv + w
            if nd < dist.get(to, float("inf")):
                dist[to] = nd
                heapq.heappush(pq, (nd, to))
    return dist


def _random_weighted(rng, n_nodes, n_edges, wmax=50):
    return [
        (rng.randrange(n_nodes), rng.randrange(n_nodes), rng.randint(1, wmax))
        for _ in range(n_edges)
    ]


def test_shortest_paths_matches_dijkstra(spark):
    from activity_files_spark.operators.graph import shortest_paths

    rng = random.Random(31)
    edges = _random_weighted(rng, n_nodes=30, n_edges=70)
    exp = _dijkstra(edges, source=0)
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    srcs = spark.createDataFrame([(0,)], "node long")
    out = shortest_paths(e, srcs, rounds=30).collect()
    got = {r["node"]: r["dist"] for r in out}
    assert got == exp
    # converged: every node's distance stopped changing
    assert all(r["prev_dist"] == r["dist"] for r in out)


def test_shortest_paths_partial_rounds_certificate(spark):
    from activity_files_spark.operators.graph import shortest_paths

    # 5-node path with unit weights: 2 rounds cannot settle node 4
    edges = [(i, i + 1, 1) for i in range(4)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    srcs = spark.createDataFrame([(0,)], "node long")
    out = {r["node"]: r for r in shortest_paths(e, srcs, rounds=2).collect()}
    assert set(out) == {0, 1, 2}  # node 3 not reached in 2 rounds
    assert out[2]["prev_dist"] is None  # first reached in the final round
    full = {r["node"]: r for r in shortest_paths(e, srcs, rounds=5).collect()}
    assert {k: v["dist"] for k, v in full.items()} == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
    assert all(v["prev_dist"] == v["dist"] for v in full.values())


def test_shortest_paths_sql_twin_matches(spark):
    from activity_files_spark.operators.graph import (
        shortest_paths,
        shortest_paths_sql,
    )

    rng = random.Random(37)
    edges = _random_weighted(rng, n_nodes=25, n_edges=60)
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    srcs = spark.createDataFrame([(0,), (7,)], "node long")  # multi-source
    got = {
        r["node"]: (r["dist"], r["prev_dist"])
        for r in shortest_paths(e, srcs, rounds=12).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT, w BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", edges)
    ctes, final = shortest_paths_sql("e", "s", 12)
    sql = (
        "WITH s AS (SELECT * FROM (VALUES (0), (7)) t(node)),\n    "
        + ctes
        + f"\nSELECT node, dist, prev_dist FROM {final}"
    )
    exp = {n: (d, p) for n, d, p in con.sql(sql).fetchall()}
    assert got == exp
