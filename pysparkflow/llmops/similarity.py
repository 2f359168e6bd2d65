"""Approximate-nearest-neighbor search over an embedding column
(array<float>), for training-data curation (near-dup mining, hard-negative
mining, cluster sampling).

Two paths:

* ``knn_bruteforce`` — exact cosine top-k: broadcast the (small) query set
  against the full corpus; one pass, no shuffle of the corpus. The
  correctness baseline, and the right plan whenever |queries| is small —
  even at 100 TB the corpus streams through codegen'd zip_with/aggregate
  arithmetic once.
* ``knn_lsh`` — random-hyperplane LSH: sign-bit signatures bucketed into
  bands; only bucket-colliding (query, item) pairs are reranked with exact
  cosine. The scale path when |queries| is large: candidate generation is
  an equi-join on (band, bucket), never a cross join.

Hyperplanes are generated deterministically from a seed (numpy
Generator(seed)) and shipped as literal arrays — no Python in the scoring
path; cosine runs JVM-side (functions/vector.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pysparkflow.functions.vector import cosine_similarity


def knn_bruteforce(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, item_id, cosine, rank), rank 1..k, excluding the
    query row itself; ties broken by item id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    it = items.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("i_vec"))
    scored = (
        it.crossJoin(F.broadcast(q))
        .where(F.col("item_id") != F.col("query_id"))
        .select(
            "query_id",
            "item_id",
            cosine_similarity("q_vec", "i_vec").alias("cosine"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", F.col("cosine"), "rank")
    )


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact: (id_a, id_b, cosine)
    with id_a < id_b and cosine >= threshold.

    Vectors are L2-normalized once up front so each pair costs one dot
    product. The all-pairs form is the *correctness baseline* (and the
    oracle-checkable one); at corpus scale, run the LSH band join
    (``knn_lsh``'s bucket machinery) as a prefilter and this exact dot
    only on bucket-colliding pairs."""
    from pysparkflow.functions.vector import l2_norm

    n = emb.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col), lambda x: x.cast("double") / l2_norm(F.col(vec_col))
        ).alias("nv"),
    )
    a = n.select(F.col("id").alias("id_a"), F.col("nv").alias("va"))
    b = n.select(F.col("id").alias("id_b"), F.col("nv").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def lsh_signature(vec_col: str, planes: list[list[float]]):
    """Sign-bit signature: bit i = 1 iff dot(vec, plane_i) >= 0."""
    bits = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _fit_centroids_sample(
    items: DataFrame, n_cells: int, vec_col: str, seed: int, sample_rows: int = 4096
) -> list[list[float]]:
    """Deterministic k-means-lite centroid fit on a driver-side sample
    (a few Lloyd iterations in numpy). The sample is hash-ordered
    (reproducible); at 100 TB the sample is still a few thousand rows —
    fitting stays O(sample), never O(corpus)."""
    rows = (
        items.select(vec_col)
        .orderBy(F.xxhash64(vec_col, F.lit(seed)))
        .limit(sample_rows)
        .collect()
    )
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(8):
        sims = X @ C.T
        assign = sims.argmax(axis=1)
        for k in range(len(C)):
            members = X[assign == k]
            if len(members):
                c = members.mean(axis=0)
                C[k] = c / (np.linalg.norm(c) or 1.0)
    return C.tolist()


def _cell_scores(vec_col: str, centroids: list[list[float]]):
    """Array of dot(vec, centroid_k) for every cell, JVM-side."""
    scores = []
    for c in centroids:
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        scores.append(
            F.aggregate(
                F.zip_with(F.col(vec_col), lit_c, lambda x, p: x.cast("double") * p),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*scores)


def knn_ivf(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate kNN: corpus vectors are assigned to
    their nearest centroid cell; each query probes its ``n_probe`` nearest
    cells and reranks candidates with exact cosine.

    Scale shape: centroids fit on a driver sample and ship as literals;
    cell assignment is a map-only pass; the candidate join is an equi-join
    on the cell id — per-query work is |corpus|·(n_probe/n_cells) instead
    of |corpus|. Recall < 1 by construction; measure vs knn_bruteforce."""
    centroids = _fit_centroids_sample(items, n_cells, vec_col, seed)

    it = (
        items.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("i_vec"))
        .withColumn("cells", _cell_scores("i_vec", centroids))
        .withColumn(
            "cell", F.array_position("cells", F.array_max("cells")) - 1
        )
        .drop("cells")
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("cells", _cell_scores("q_vec", centroids))
        .withColumn(
            "probe",
            F.explode(
                F.slice(
                    F.reverse(
                        F.array_sort(
                            F.transform(
                                F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                                lambda i: F.struct(
                                    F.element_at("cells", i + 1).alias("s"),
                                    i.alias("cell"),
                                ),
                            )
                        )
                    ),
                    1,
                    n_probe,
                )
            ),
        )
        .select("query_id", "q_vec", F.col("probe.cell").alias("cell"))
    )
    cands = it.join(q, "cell").where(F.col("item_id") != F.col("query_id"))
    scored = cands.select(
        "query_id", "item_id", cosine_similarity("q_vec", "i_vec").alias("cosine")
    ).distinct()
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def knn_lsh(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 16,
    bands: int = 4,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via random-hyperplane LSH.

    Signature split into ``bands`` prefix bands; a (query, item) pair is a
    candidate if any band matches; candidates reranked by exact cosine.
    Recall < 1 by construction — measure against knn_bruteforce."""
    assert n_bits % bands == 0
    if dim is None:
        dim = len(items.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_bits, seed)
    r = n_bits // bands

    def banded(df: DataFrame, role: str) -> DataFrame:
        sig = lsh_signature(vec_col, planes)
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}_vec"),
            F.explode(
                F.array(
                    *[
                        F.concat(
                            F.lit(f"{b}:"), F.substring(sig, b * r + 1, r)
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bucket"),
        )

    qb = banded(queries, "query")
    ib = banded(items, "item")
    cands = (
        ib.join(qb, "bucket")
        .where(F.col("item_id") != F.col("query_id"))
        .select("query_id", "query_vec", "item_id", "item_vec")
        .distinct()
    )
    scored = cands.select(
        "query_id",
        "item_id",
        cosine_similarity("query_vec", "item_vec").alias("cosine"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )
