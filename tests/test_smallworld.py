"""The reference's target workload shape (README.md:3 "small-world
network graph"): Watts-Strogatz topology, unit capacities, multi-source/
multi-sink sets — sized down to keep the suite fast."""

from __future__ import annotations

import random

import networkx as nx

from pysparkflow.algo.maxflow import MaxFlowConfig, max_flow
from pysparkflow.graph.graph import FlowGraph


def test_smallworld_multiset_maxflow(spark):
    ws = nx.watts_strogatz_graph(300, 6, 0.1, seed=42)
    edges = [(u + 10, v + 10, 1) for u, v in ws.edges()]
    df = spark.createDataFrame(edges, "src long, dst long, capacity long")
    g = FlowGraph.from_edge_pairs(spark, df, cap_col="capacity")
    r = random.Random(42)
    picks = r.sample([n + 10 for n in ws.nodes()], 16)
    sources, sinks = picks[:8], picks[8:]

    G = nx.Graph()
    for u, v, c in edges:
        G.add_edge(u, v, capacity=c)
    for x in sources:
        G.add_edge("S", x, capacity=10_000_000)
    for x in sinks:
        G.add_edge("T", x, capacity=10_000_000)
    expected = nx.maximum_flow_value(G, "S", "T")

    res = max_flow(
        g,
        sources,
        sinks,
        MaxFlowConfig(excess_list_max=4, meet_extra_rounds=2, validate=True),
    )
    assert res.value == expected
