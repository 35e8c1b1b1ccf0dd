"""Graph operators: connected components over a pair graph.

The missing last stage of every near-dup pipeline: pair mining (MinHash /
SimHash / banded-Hamming / embedding-LSH, operators/dedup.py and
similarity.py) emits EDGES, but a deduplicating writer needs CLUSTERS —
"these k documents are all the same; keep one canonical representative".
The reference has no notion of cross-file identity at all; this is
north-rule corpus infrastructure built fresh.

``connected_components`` is iterative min-label propagation with pointer
jumping:

- labels start as each node's own id;
- each round every node takes the min of (its label, its neighbors'
  labels) — one equi-join + map-side-combined groupBy — and then labels
  chase their own label's label (pointer doubling), which collapses long
  chains in O(log diameter) rounds instead of O(diameter);
- convergence is detected by the (monotonically non-increasing) global
  label sum: a driver-side loop with one tiny agg action per round, the
  same bounded-iteration shape as the kNN ring expansion
  (spatial.knn_join).

The fixpoint (every node labeled with the MINIMUM id reachable from it)
is schedule-independent, so the result is deterministic regardless of
partitioning or iteration interleaving. At 100 TB the per-round cost is
two equi-joins on (node/label) — shuffle volume ~ |edges| + |nodes| —
and near-dup graphs have tiny diameters (clusters are cliques-ish), so
3-4 rounds typically suffice.

The DuckDB oracle twin (:func:`connected_components_sql`) expresses the
same fixpoint as a WITH RECURSIVE transitive min-label closure — the
UNION-dedup'd reach set — so the clustering is hash-gated exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Components of the undirected edge graph. Returns (node, component)
    where ``component`` is the minimum node id in the node's component.
    Nodes not appearing in any edge are absent (singletons are the
    caller's no-op case)."""
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    # checkpoint the symmetrized edge list ONCE: it feeds every round's
    # neighbor join, and without this the upstream pair-mining pipeline
    # would be recomputed per round
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = (
            labels.join(neigh, labels["node"] == neigh["node2"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
            )
        )
        # pointer jumping: label <- label(label)
        l2 = stepped.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        jumped = (
            stepped.join(l2, stepped["label"] == l2["pnode"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))).alias("label"),
            )
        )
        labels = jumped.localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    return labels.select("node", F.col("label").alias("component"))


def connected_components_sql(edges_cte: str) -> str:
    """DuckDB oracle body: transitive min-label closure over a CTE named
    ``edges_cte`` with columns (a, b) — DIRECTED rows; the closure
    symmetrizes. Binds cc_edges / cc_nodes / cc_reach / cc_labels; the
    caller SELECTs (node, component) from ``cc_labels``. Requires the
    enclosing WITH to be RECURSIVE."""
    return f"""
    cc_edges AS (
      SELECT a, b FROM {edges_cte}
      UNION
      SELECT b, a FROM {edges_cte}
    ),
    cc_nodes AS (
      SELECT DISTINCT a AS n FROM cc_edges
    ),
    cc_reach AS (
      SELECT n AS node, n AS label FROM cc_nodes
      UNION
      SELECT e.b AS node, r.label
      FROM cc_reach r JOIN cc_edges e ON e.a = r.node
      WHERE r.label < e.b
    ),
    cc_labels AS (
      SELECT node, MIN(label) AS component FROM cc_reach GROUP BY node
    )
    """


__all__ = ["connected_components", "connected_components_sql"]
