"""Minimum s-t cut extraction — the dual certificate of max-flow.

The reference computes only the flow VALUE (ff1/FordFulkerson.java:229-235
prints per-round totals); the cut itself is the natural completion of the
family: the set of saturated edges separating the source side from the
sink side, with cut capacity == max-flow value by strong duality. That
equality is checked at runtime — the result carries its own optimality
certificate (stronger than the reference's convergence heuristic, in the
same spirit as maxflow's exhaustion proof).

Plan shape: one max-flow run, then a BFS over the residual graph
(frontier-only shuffles against the cached residual arc table — the D13
schimmy discipline), then one join to classify crossing edges. Nothing
here adds a corpus-scale shuffle beyond what max-flow already does.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pysparkflow.algo.maxflow import MaxFlowConfig, MaxFlowResult, _residual_arcs, max_flow
from pysparkflow.graph.graph import FlowGraph


@dataclass
class MinCutResult:
    value: int            # cut capacity == max-flow value (certified)
    cut_edges: DataFrame  # (u, v, cap) original edges crossing S -> T
    s_side: DataFrame     # (vertex) residual-reachable set S
    flow: MaxFlowResult
    certified: bool       # cut capacity == flow value (strong duality)


def min_cut(
    graph: FlowGraph,
    sources: Iterable[int],
    sinks: Iterable[int],
    config: MaxFlowConfig | None = None,
    flow_result: MaxFlowResult | None = None,
) -> MinCutResult:
    """Exact minimum s-t cut: run max_flow (or reuse ``flow_result`` from
    an earlier run on the SAME graph/sources/sinks — the registry shares
    one run between the max_flow and min_cut entries), take S = vertices
    reachable from the super-source in the residual graph, and return the
    original edges crossing S -> V\\S. Asserts cut capacity == flow
    value."""
    res = flow_result or max_flow(graph, sources, sinks, config=config)
    # rebuild the super-node graph deterministically (same ids as the run)
    g2, s_id, t_id = graph.with_super_nodes(sources, sinks)
    spark = g2.spark

    from pysparkflow.engine.partitioning import sized_partitions, state_join_side

    arcs = _residual_arcs(g2.edges, res.flows, broadcast_flows=True).persist()
    # one count job materializes the cache (the first BFS round would
    # have paid that anyway) and bounds the broadcast gate below
    n_res = arcs.count()
    arc_parts = sized_partitions(n_res, arcs)
    # directed BFS over residual arcs: frontier-only shuffles, the arc
    # table is scanned from cache each round (schimmy); the frontier and
    # reach sides are broadcast-gated (state_join_side) so the cached
    # residual arcs are never re-exchanged or re-sorted per round
    reach = spark.createDataFrame([(int(s_id),)], "vertex long").persist()
    frontier = reach
    while True:
        fr = state_join_side(frontier, n_res, arc_parts, "vertex")
        nxt = (
            arcs.join(fr, fr.vertex == arcs.src)
            .select(F.col("dst").alias("vertex"))
            .distinct()
            .join(
                state_join_side(reach, n_res, arc_parts, "vertex"),
                "vertex",
                "left_anti",
            )
            .localCheckpoint()
        )
        if not nxt.take(1):
            break
        reach = reach.unionByName(nxt).localCheckpoint()
        frontier = nxt
    arcs.unpersist(blocking=False)

    s_side = reach
    in_s = reach.select(F.col("vertex").alias("u")).withColumn("_su", F.lit(1))
    in_s_v = reach.select(F.col("vertex").alias("v")).withColumn("_sv", F.lit(1))
    classified = (
        g2.edges.join(F.broadcast(in_s), "u", "left")
        .join(F.broadcast(in_s_v), "v", "left")
        .withColumn("_su", F.coalesce("_su", F.lit(0)))
        .withColumn("_sv", F.coalesce("_sv", F.lit(0)))
    )
    cut_edges = classified.where(F.col("_su") != F.col("_sv")).select("u", "v", "cap")
    cut_value = cut_edges.agg(F.coalesce(F.sum("cap"), F.lit(0))).first()[0]
    certified = int(cut_value) == int(res.value)
    assert certified, (
        f"cut capacity {cut_value} != max-flow value {res.value} — "
        "duality violated, flow or reachability is wrong"
    )
    return MinCutResult(
        value=int(cut_value),
        cut_edges=cut_edges,
        s_side=s_side,
        flow=res,
        certified=certified,
    )
