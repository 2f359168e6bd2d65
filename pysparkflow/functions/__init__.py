from pysparkflow.functions.text import (
    edge_id,
    portable_hash32,
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
    "portable_hash32",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
