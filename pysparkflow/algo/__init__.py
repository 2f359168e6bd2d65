from pysparkflow.algo.bfs import bfs_distances
from pysparkflow.algo.components import connected_components
from pysparkflow.algo.maxflow import MaxFlowConfig, MaxFlowResult, max_flow

__all__ = [
    "MaxFlowConfig",
    "MaxFlowResult",
    "max_flow",
    "bfs_distances",
    "connected_components",
]
