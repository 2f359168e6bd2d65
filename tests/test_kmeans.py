"""Lloyd's k-means (llmops/kmeans.py): planted-cluster recovery,
determinism, and the keep-old-centroid rule for empty clusters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkflow.llmops.kmeans import (
    assign_clusters,
    kmeans_assignments,
    kmeans_fit,
)


def _planted(spark, per=20, dim=4):
    """Three well-separated planted clusters around (0..), (10..),
    (-10..); ids ordered so ids 0,1,2 land in distinct clusters (the
    smallest-k-ids init then starts one centroid inside each)."""
    rows = []
    centers = [0.0, 10.0, -10.0]
    for i in range(per * 3):
        c = i % 3
        # deterministic ±0.3 jitter
        jit = [((i * 31 + d * 7) % 13 - 6) / 20.0 for d in range(dim)]
        rows.append((i, [centers[c] + j for j in jit]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_planted_clusters(spark):
    emb = _planted(spark)
    out = kmeans_assignments(emb, k=3, rounds=3).collect()
    assert len(out) == 60
    # every member of a planted group got the same cluster id, and the
    # three groups got three distinct ids
    by_group = {}
    for r in out:
        by_group.setdefault(r["id"] % 3, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_group.values()), by_group
    assert len(set().union(*by_group.values())) == 3
    # converged: every point sits within the jitter ball of its centroid
    assert max(r["dist"] for r in out) < 4 * 0.3**2 + 1e-6


def test_kmeans_fit_deterministic(spark):
    emb = _planted(spark)
    c1 = kmeans_fit(emb, k=3, rounds=2)
    c2 = kmeans_fit(emb, k=3, rounds=2)
    assert c1 == c2  # exact: rounded state, deterministic init/ties


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # two far points + k=2 init on ids 0,1 which sit in the SAME spot:
    # cluster 1 (the duplicate of 0 at init) immediately loses every
    # point to cluster 0's identical centroid (first-argmin tie-break)
    # and must keep its previous centroid instead of vanishing
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_fit(emb, k=2, rounds=2)
    assert len(cents) == 2
    # cluster 0 averaged toward its members; cluster 1 froze at init
    assert cents[1] == [0.0, 0.0]


def test_assign_first_argmin_tie_break(spark):
    emb = spark.createDataFrame(
        [(7, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    # equidistant centroids: the smaller cluster id wins
    out = assign_clusters(emb, [[0.0, 0.0], [2.0, 2.0]]).collect()
    assert out[0]["cluster"] == 0


def test_kmeans_raises_on_too_few_vectors(spark):
    emb = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="k=3"):
        kmeans_fit(emb, k=3, rounds=1)
