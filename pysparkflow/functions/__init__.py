from pysparkflow.functions.text import (
    edge_id,
    shingles,
    token_count,
    tokens,
)
from pysparkflow.functions.vector import cosine_similarity, dot, l2_norm

__all__ = [
    "tokens",
    "token_count",
    "shingles",
    "edge_id",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
