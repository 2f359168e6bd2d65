from pysparkflow.graph.graph import (
    FlowGraph,
    INF_CAPACITY,
    assign_deterministic_capacities,
    degrees,
    symmetrize,
)

__all__ = [
    "FlowGraph",
    "INF_CAPACITY",
    "assign_deterministic_capacities",
    "degrees",
    "symmetrize",
]
