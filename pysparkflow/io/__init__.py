from pysparkflow.io.adjacency import read_adjacency
from pysparkflow.io.dimacs import read_dimacs
from pysparkflow.io.edgelist import read_edgelist

__all__ = ["read_adjacency", "read_dimacs", "read_edgelist"]
