"""Reader tolerance tests (FIXTURES.md §5 semantics)."""

from __future__ import annotations

import gzip

from pysparkflow.io.adjacency import read_adjacency
from pysparkflow.io.dimacs import read_dimacs


def test_dimacs_parallel_arcs_and_nodes(spark, tmp_path):
    p = tmp_path / "g.max"
    p.write_text(
        "c comment\n"
        "p max 4 5\n"
        "n 11 s\n"
        "n 14 t\n"
        "a 11 12 3\n"
        "a 12 11 2\n"  # opposite arc: shared capacity sums (cab+cba)
        "a 12 14 2\n"
        "a 11 13 1\n"
        "a 13 14 4\n"
    )
    dg = read_dimacs(spark, str(p))
    assert (dg.n, dg.m) == (4, 5)
    assert dg.sources == [11] and dg.sinks == [14]
    edges = {(r["u"], r["v"]): r["cap"] for r in dg.graph.edges.collect()}
    assert edges[(11, 12)] == 5  # 3 + 2 merged

def test_adjacency_tolerance(spark, tmp_path):
    raw = (
        "11\tmeta\t12\t13\n"
        "12\tmeta\t11\tBAD\t14\n"  # malformed token skipped
        "13\tmeta\t13\t11\n"  # self-loop dropped
        "14\tmeta\t12\n"
        + "99\tmeta" + "\t1" * 6000 + "\n"  # >5100 fields → line rejected
    )
    p = tmp_path / "adj.tsv.gz"
    with gzip.open(p, "wt") as f:
        f.write(raw)
    g = read_adjacency(spark, str(p))
    edges = sorted((r["u"], r["v"]) for r in g.edges.collect())
    assert edges == [(11, 12), (11, 13), (12, 14)]


def test_adjacency_id_folding(spark, tmp_path):
    p = tmp_path / "fold.tsv"
    big = 10**14 + 5  # folds to -5
    p.write_text(f"11\tmeta\t{big}\n")
    g = read_adjacency(spark, str(p), fold_large_ids=True)
    edges = [(r["u"], r["v"]) for r in g.edges.collect()]
    assert edges == [(-5, 11)]


def test_edgelist_csv_and_parquet(spark, tmp_path):
    from pysparkflow.io.edgelist import read_edgelist

    p = tmp_path / "edges.csv"
    p.write_text("src,dst,capacity\n10,11,3\n11,10,2\n11,12,4\n")
    g = read_edgelist(spark, str(p), fmt="csv", cap_col="capacity")
    edges = {(r["u"], r["v"]): r["cap"] for r in g.edges.collect()}
    assert edges == {(10, 11): 5, (11, 12): 4}

    pq = tmp_path / "edges.parquet"
    spark.createDataFrame(
        [(10, 11, 3), (11, 12, 4)], "src long, dst long, capacity long"
    ).write.parquet(str(pq))
    g2 = read_edgelist(spark, str(pq), cap_col="capacity")
    assert {(r["u"], r["v"]) for r in g2.edges.collect()} == {(10, 11), (11, 12)}


def test_committed_raw_fixtures(spark):
    """The raw-format fixture files described by FIXTURES.md §5."""
    import networkx as nx

    from pathlib import Path

    fixtures = Path(__file__).resolve().parents[1] / "fixtures" / "raw"
    dg = read_dimacs(spark, str(fixtures / "dimacs_small.max"))
    assert dg.sources == [11] and dg.sinks == [16]
    from pysparkflow.algo.maxflow import MaxFlowConfig, max_flow

    res = max_flow(dg.graph, dg.sources, dg.sinks, MaxFlowConfig(validate=True))
    G = nx.Graph()
    for r in dg.graph.edges.collect():
        G.add_edge(r["u"], r["v"], capacity=r["cap"])
    assert res.value == nx.maximum_flow_value(G, 11, 16)

    g = read_adjacency(spark, str(fixtures / "adjacency_small.tsv.gz"))
    edges = sorted((r["u"], r["v"]) for r in g.edges.collect())
    assert (13, 13) not in edges          # self-loop dropped
    assert all(u != 99 and v != 99 for u, v in edges)  # long line rejected
    assert (11, 12) in edges and (14, 15) in edges
