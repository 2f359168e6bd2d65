"""Min-cut vs the NetworkX oracle: cut value, duality certificate, and
the partition actually separating sources from sinks."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from pysparkflow.algo.maxflow import MaxFlowConfig
from pysparkflow.algo.mincut import min_cut
from pysparkflow.graph.graph import FlowGraph


def _graph(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long, capacity long")
    return FlowGraph.from_edge_pairs(spark, df, cap_col="capacity")


EDGES = [
    (1, 2, 3), (1, 3, 2), (2, 4, 2), (3, 4, 3), (2, 3, 1), (4, 5, 4),
    (1, 5, 1),
]


def test_min_cut_matches_networkx(spark):
    g = _graph(spark, EDGES)
    res = min_cut(g, sources=[1], sinks=[5], config=MaxFlowConfig(validate=True))

    G = nx.Graph()
    for u, v, c in EDGES:
        G.add_edge(u, v, capacity=c)
    nx_val, (nx_s, nx_t) = nx.minimum_cut(G, 1, 5)
    assert res.value == nx_val and res.certified

    # our S side (minus the super nodes) must separate sources from sinks
    s = {r.vertex for r in res.s_side.collect()}
    assert 1 in s and 5 not in s
    # every cut edge crosses the partition
    for r in res.cut_edges.collect():
        assert (r.u in s) != (r.v in s)


def test_min_cut_multi_source_sink(spark):
    g = _graph(spark, EDGES)
    res = min_cut(g, sources=[1, 2], sinks=[4, 5])
    G = nx.Graph()
    for u, v, c in EDGES:
        G.add_edge(u, v, capacity=c)
    S, T = -1, -2
    for x in (1, 2):
        G.add_edge(S, x, capacity=10**9)
    for x in (4, 5):
        G.add_edge(T, x, capacity=10**9)
    nx_val, _ = nx.minimum_cut(G, S, T)
    assert res.value == nx_val and res.certified


def test_min_cut_disconnected_is_zero(spark):
    g = _graph(spark, [(1, 2, 5), (3, 4, 5)])
    res = min_cut(g, sources=[1], sinks=[4])
    assert res.value == 0 and res.cut_edges.count() == 0
