"""Property-based checks (SURVEY.md §5 strategy (d)): random small graphs
vs the NetworkX oracle, and invariance of the max-flow value under vertex
relabeling. Example counts are kept small — every example is a full
distributed run."""

from __future__ import annotations

import networkx as nx
from hypothesis import given, settings, strategies as st

from pysparkflow.algo.maxflow import MaxFlowConfig, max_flow
from pysparkflow.graph.graph import FlowGraph

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from pysparkflow.session import get_spark

        _spark = get_spark(
            app_name="pysparkflow-prop", master="local[4]", shuffle_partitions=4
        )
    return _spark


def _oracle(edges, sources, sinks):
    g = nx.Graph()
    for u, v, c in edges:
        if g.has_edge(u, v):
            g[u][v]["capacity"] += c
        else:
            g.add_edge(u, v, capacity=c)
    for x in sources:
        g.add_edge("S", x, capacity=10_000_000)
    for x in sinks:
        g.add_edge("T", x, capacity=10_000_000)
    return nx.maximum_flow_value(g, "S", "T")


@st.composite
def small_graph(draw):
    n = draw(st.integers(6, 10))
    m = draw(st.integers(n, 2 * n))
    seed = draw(st.integers(0, 10_000))
    rng = nx.gnm_random_graph(n, m, seed=seed)
    caps = draw(
        st.lists(st.integers(1, 4), min_size=m + 1, max_size=2 * n + 1)
    )
    edges = [
        (u + 10, v + 10, caps[i % len(caps)]) for i, (u, v) in enumerate(rng.edges())
    ]
    return edges


@settings(max_examples=4, deadline=None)
@given(small_graph())
def test_maxflow_matches_networkx(edges):
    if not edges:
        return
    spark = _get_spark()
    nodes = sorted({x for e in edges for x in e[:2]})
    sources, sinks = nodes[:1], nodes[-1:]
    if sources == sinks:
        return
    df = spark.createDataFrame(edges, "src long, dst long, capacity long")
    g = FlowGraph.from_edge_pairs(spark, df, cap_col="capacity")
    res = max_flow(g, sources, sinks, MaxFlowConfig(validate=True))
    assert res.value == _oracle(edges, sources, sinks)


@settings(max_examples=2, deadline=None)
@given(small_graph(), st.integers(1, 1_000_000))
def test_maxflow_invariant_under_relabeling(edges, offset):
    if not edges:
        return
    spark = _get_spark()
    nodes = sorted({x for e in edges for x in e[:2]})
    sources, sinks = nodes[:1], nodes[-1:]
    if sources == sinks:
        return
    df = spark.createDataFrame(edges, "src long, dst long, capacity long")
    g = FlowGraph.from_edge_pairs(spark, df, cap_col="capacity")
    v1 = max_flow(g, sources, sinks).value
    remap = [(u + offset, v + offset, c) for u, v, c in edges]
    df2 = spark.createDataFrame(remap, "src long, dst long, capacity long")
    g2 = FlowGraph.from_edge_pairs(spark, df2, cap_col="capacity")
    v2 = max_flow(g2, [s + offset for s in sources], [t + offset for t in sinks]).value
    assert v1 == v2
