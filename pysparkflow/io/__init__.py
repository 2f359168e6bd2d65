from pysparkflow.io.adjacency import read_adjacency
from pysparkflow.io.dimacs import read_dimacs
from pysparkflow.io.edgelist import read_edgelist
from pysparkflow.io.writers import dump_records, read_flow_result, write_flow_result

__all__ = [
    "read_adjacency",
    "read_dimacs",
    "read_edgelist",
    "write_flow_result",
    "read_flow_result",
    "dump_records",
]
