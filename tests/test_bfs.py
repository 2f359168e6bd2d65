"""BFS distance tests vs a NetworkX oracle (FIXTURES.md §3:
multi-source BFS + 1; distance(source)=1 per bfs/bfs.java:69-72)."""

from __future__ import annotations

import networkx as nx

from pysparkflow.algo.bfs import bfs_distances
from pysparkflow.algo.components import connected_components
from pysparkflow.graph.graph import FlowGraph


def _build(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return FlowGraph.from_edge_pairs(spark, df)


def _oracle(pairs, sources):
    g = nx.Graph()
    g.add_nodes_from(sources)
    g.add_edges_from(pairs)
    dist = nx.multi_source_dijkstra_path_length(g, set(sources), weight=None)
    return {v: int(d) + 1 for v, d in dist.items()}


def test_bfs_path_graph(spark):
    pairs = [(10, 11), (11, 12), (12, 13)]
    got = {r["vertex"]: r["distance"] for r in bfs_distances(_build(spark, pairs), [10]).collect()}
    assert got == {10: 1, 11: 2, 12: 3, 13: 4}


def test_bfs_multi_source_vs_networkx(spark):
    g = nx.gnm_random_graph(20, 40, seed=7)
    pairs = [(u + 10, v + 10) for u, v in g.edges()]
    sources = [10, 25]
    got = {
        r["vertex"]: r["distance"]
        for r in bfs_distances(_build(spark, pairs), sources).collect()
    }
    assert got == _oracle(pairs, sources)


def test_bfs_unreached_absent(spark):
    pairs = [(10, 11), (20, 21)]
    got = {r["vertex"]: r["distance"] for r in bfs_distances(_build(spark, pairs), [10]).collect()}
    assert 20 not in got and 21 not in got


def test_connected_components(spark):
    pairs = [(10, 11), (11, 12), (20, 21), (30, 31), (31, 32), (32, 30)]
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(_build(spark, pairs)).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_connected_components_rows_hint_identical(spark):
    # rows_hint only changes the arc-cache sizing path (skips the count
    # job); the labels must be identical, even with a wildly wrong hint
    pairs = [(10, 11), (11, 12), (20, 21), (30, 31), (31, 32), (32, 30)]
    g = _build(spark, pairs)
    base = {r["vertex"]: r["component"] for r in connected_components(g).collect()}
    for hint in (1, 12, 10_000_000):
        hinted = {
            r["vertex"]: r["component"]
            for r in connected_components(g, rows_hint=hint).collect()
        }
        assert hinted == base


def test_bfs_high_diameter_path_graph(spark):
    # 200-vertex path: 200 BFS rounds exercises the level-fold guard
    # (plans would otherwise deepen with diameter); distances are exact
    from pysparkflow.graph.graph import FlowGraph

    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(n - 1)], "src long, dst long, cap long"
    )
    g = FlowGraph.from_edge_pairs(spark, edges)
    got = {
        r["vertex"]: r["distance"]
        for r in bfs_distances(g, [0]).collect()
    }
    assert got == {v: v + 1 for v in range(n)}
