"""Lloyd's k-means over an embedding column — the full clustering step
between per-group centroids (q_embedding_centroids) and cluster-balanced
sampling (llmops/similarity.cluster_balanced_sample), run as bounded
synchronous rounds of two Catalyst jobs each.

Round dataflow (the 100 TB shape):

1. ASSIGN — map-only: the k current centroids travel as LITERAL double
   arrays inside the plan (k x dim scalars — the degenerate broadcast),
   each vector's distance to every centroid is a sequential
   ``zip_with``/``aggregate`` fold, and the cluster id is the first
   argmin (``array_position`` of ``array_min`` — ties resolve to the
   smallest cluster id deterministically). No shuffle, no UDF; the whole
   expression runs in whole-stage codegen over the scan.
2. UPDATE — one combiner-friendly aggregation keyed by (cluster, dim)
   after ``posexplode``: the shuffle carries partial (sum, count) pairs,
   k x dim rows total reach the driver (512 doubles at k=8, dim=64) —
   the same vocab-sized-shuffle discipline as llmops/bpe.py.

Determinism across engines (the DuckDB oracle unrolls the identical
rounds as MATERIALIZED CTEs): the centroid STATE is rounded to 6
decimals at every round boundary — both engines then carry bit-identical
centroids into the next round, so per-round distances are IEEE-double
folds over identical inputs in identical order, and assignments cannot
drift. Aggregation-order FP noise (~1e-16) in the per-dim means is six
orders below the rounding quantum. Initial centroids are the embeddings
of the k smallest ids (deterministic, replayable ORDER BY ... LIMIT k).
Clusters that receive no vectors keep their previous centroid (both
engines replay the same keep-old rule).

The driver-coordinated round loop (collect k x dim means per round)
follows the engine's max-flow discipline (SURVEY §2.2 D8/D11 — the
driver is the coordinator; per-round state that fits on the driver lives
on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND_DECIMALS = 6


def _dist_expr(vec_col: str, centroid: list[float]):
    """Squared L2 distance of ``vec_col`` (float array) to a literal
    centroid, as a sequential left-to-right fold — the order the oracle
    replays."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(
        F.col(vec_col),
        lit,
        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist): each vector's first-argmin cluster and its
    squared distance. Map-only — centroids are plan literals."""
    dists = F.array(*[_dist_expr(vec_col, c) for c in centroids])
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("_v"),
        dists.alias("_d"),
    ).select(
        "id",
        "_v",
        (F.array_position(F.col("_d"), F.array_min(F.col("_d"))) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min(F.col("_d")).alias("dist"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """The centroids after ``rounds`` Lloyd iterations from the
    deterministic smallest-k-ids init. Returns k lists of dim floats
    (every value rounded to 6 decimals — the cross-engine state
    contract above)."""
    from pysparkflow.engine.cache import track

    # one tracked persist of the (id, vec) projection: every round's
    # assign + update jobs (and the init collect) re-scan it from cache
    # instead of re-reading the source per round; release is the
    # caller's (engine/cache.release_tracked) after consuming
    emb = track(emb.select(id_col, vec_col))
    init_rows = (
        emb.orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} but only {len(init_rows)} vectors")
    cents = [
        [round(float(x), ROUND_DECIMALS) for x in r[0]] for r in init_rows
    ]
    dim = len(cents[0])
    for _ in range(rounds):
        assigned = assign_clusters(emb, cents, id_col, vec_col)
        upd = (
            assigned.select("cluster", F.posexplode("_v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("mean"))
            .collect()
        )
        new = [list(c) for c in cents]  # empty clusters keep old centroid
        for r in upd:
            new[r["cluster"]][r["dim"]] = round(float(r["mean"]), ROUND_DECIMALS)
        cents = new
        assert all(len(c) == dim for c in cents)
    return cents


def kmeans_assignments(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final (id, cluster, dist) assignment table after ``rounds``
    iterations; dist rounded to 6 decimals for engine-portable output."""
    cents = kmeans_fit(emb, k, rounds, id_col, vec_col)
    return assign_clusters(emb, cents, id_col, vec_col).select(
        "id", "cluster", F.round("dist", ROUND_DECIMALS).alias("dist")
    )
