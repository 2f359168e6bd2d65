from pysparkflow.llmops.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from pysparkflow.llmops.similarity import (
    embedding_cosine_pairs,
    embedding_near_dups_lsh,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
)
from pysparkflow.llmops.textstats import language_scores, quality_features

__all__ = [
    "exact_duplicates",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "embedding_cosine_pairs",
    "embedding_near_dups_lsh",
    "quality_features",
    "language_scores",
]
