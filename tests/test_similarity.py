"""Similarity-search tests: brute-force exactness vs numpy, LSH recall."""

from __future__ import annotations

import numpy as np
import pytest

from pysparkflow.llmops.similarity import knn_bruteforce, knn_lsh


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_bruteforce_matches_numpy(spark, emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    queries = emb.where("vec_id < 2")
    got = knn_bruteforce(emb, queries, k=3).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["item_id"], r["cosine"]))
    for qid, items in by_q.items():
        q = vecs[qid]
        sims = {
            vid: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
            for vid, v in vecs.items()
            if vid != qid
        }
        expected = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert [i for i, _ in items] == [i for i, _ in expected]
        for (_, got_c), (_, exp_c) in zip(items, expected):
            assert abs(got_c - exp_c) < 1e-9


def test_ivf_recall_vs_bruteforce(spark, emb):
    from pysparkflow.llmops.similarity import knn_ivf

    queries = emb.where("vec_id < 10")
    exact = {
        (r["query_id"], r["item_id"])
        for r in knn_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["item_id"])
        for r in knn_ivf(emb, queries, k=5, n_cells=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random embeddings are IVF's worst case; uniform probing would give
    # n_probe/n_cells = 0.25 — demand clearly better
    assert recall >= 0.4, f"IVF recall too low: {recall}"


def test_lsh_recall_vs_bruteforce(spark, emb):
    queries = emb.where("vec_id < 10")
    exact = {
        (r["query_id"], r["item_id"])
        for r in knn_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["item_id"])
        for r in knn_lsh(emb, queries, k=5, dim=64).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_embedding_cosine_pairs_exact_vs_numpy(spark, emb):
    from pysparkflow.llmops.similarity import embedding_cosine_pairs

    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    norm = {k: v / np.linalg.norm(v) for k, v in vecs.items()}
    ids = sorted(norm)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = float(norm[a] @ norm[b])
            if c >= 0.4:
                expected[(a, b)] = c
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, threshold=0.4).collect()
    }
    # the blocked centroid-pruned plan is EXACT: identical pair set
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-9


def test_embedding_cosine_pairs_small_chunks(spark, emb):
    # chunking must not change the answer (block boundaries exercise the
    # same-cell cross-chunk and diagonal-block paths)
    from pysparkflow.llmops.similarity import embedding_cosine_pairs

    a = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(emb, threshold=0.5).collect()
    }
    b = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(
            emb, threshold=0.5, n_cells=4, chunk_rows=37
        ).collect()
    }
    assert a == b


def test_embedding_near_dups_lsh_recall(spark, emb):
    from pysparkflow.llmops.similarity import (
        embedding_cosine_pairs,
        embedding_near_dups_lsh,
    )

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups_lsh(emb, threshold=0.4, dim=64).collect()
    }
    # verify step makes precision exact; recall < 1 by construction
    assert approx <= exact
    assert len(approx) / len(exact) >= 0.9


def test_band_buckets_rejects_wrong_dim(spark):
    """A clear error names the dim mismatch instead of an opaque numpy
    shape error deep inside the Arrow batch."""
    from pysparkflow.llmops.similarity import knn_lsh

    small = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [4.0, 5.0, 6.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="dim 3, expected 64"):
        knn_lsh(small, small, k=1).collect()


def test_band_buckets_rejects_wide_band_packing():
    from pysparkflow.llmops.similarity import _band_buckets

    with pytest.raises(ValueError, match="> 48"):
        _band_buckets(None, "id", "v", n_bits=64, bands=1, dim=64, seed=42)
    with pytest.raises(ValueError, match="not divisible"):
        _band_buckets(None, "id", "v", n_bits=64, bands=3, dim=64, seed=42)


def test_tracked_caches_released(spark, emb):
    """Operator-internal persists are registered and release_tracked()
    drops them (round-3 ADVICE: persisted intermediates never unpersisted)."""
    from pysparkflow.engine.cache import release_tracked, tracked_count
    from pysparkflow.llmops.dedup import ngram_jaccard_pairs

    release_tracked()  # clean slate
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w q u")],
        "doc_id long, text string",
    )
    ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert tracked_count() >= 1
    released = release_tracked()
    assert released >= 1 and tracked_count() == 0


def test_registry_ivf_pins_match_numpy_oracle():
    """The graded knn_ivf / knn_ivf_recall pins are DERIVED from the
    hashlib+numpy recomputation in tools/ivf_oracle.py, not transcribed
    engine output (round-2/3 ADVICE)."""
    import sys

    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from ivf_oracle import compute_pins

    from pysparkflow.relational.registry import _KNN_IVF_PINNED_ROWS

    pins, (n_true, n_hit, recall) = compute_pins(
        "/root/testdata/sf0.01/embeddings.parquet"
    )
    assert pins == list(_KNN_IVF_PINNED_ROWS)
    assert (n_true, n_hit, recall) == (15, 10, 0.6667)

    from ivf_oracle import compute_cluster_sample_pins

    from pysparkflow.relational.registry import _CLUSTER_SAMPLE_PINNED_ROWS

    cs = compute_cluster_sample_pins("/root/testdata/sf0.01/embeddings.parquet")
    assert cs == list(_CLUSTER_SAMPLE_PINNED_ROWS)


def test_cluster_balanced_sample_semantics(spark, emb):
    from pysparkflow.llmops.similarity import cluster_balanced_sample

    out = cluster_balanced_sample(emb, per_cell=3, n_cells=8).collect()
    per_cell: dict[int, list] = {}
    for r in out:
        per_cell.setdefault(r.cell, []).append(r.rk)
    assert len(per_cell) <= 8
    for ranks in per_cell.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    ids = [r.id for r in out]
    assert len(ids) == len(set(ids))


def test_knn_graph_clusters(spark):
    # 4 tight clusters of 10 vectors each: every vector's top neighbors
    # must come from its own cluster (in-cluster cosine ~0.99+, across
    # ~0); tight pairs collide in every LSH band, so recall is exact here
    from pysparkflow.llmops.similarity import knn_graph

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 64)) * 10
    rows = []
    for i in range(40):
        v = centers[i % 4] + rng.standard_normal(64) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = knn_graph(df, k=3, dim=64).collect()
    assert len(out) == 40 * 3
    for r in out:
        assert r["id"] % 4 == r["neighbor"] % 4, (r["id"], r["neighbor"])
        assert r["cosine"] > 0.9


def test_knn_graph_symmetric_scoring(spark, emb):
    # the undirected verify + mirror must score (a,b) and (b,a) equally
    from pysparkflow.llmops.similarity import knn_graph

    out = knn_graph(emb.where("vec_id < 50"), k=5, dim=64)
    pdf = out.toPandas()
    sc = {(r.id, r.neighbor): r.cosine for r in pdf.itertuples()}
    for (a, b), c in sc.items():
        if (b, a) in sc:
            assert abs(sc[(b, a)] - c) < 1e-12


def test_normalized_rows_matches_catalyst(spark, emb):
    """_normalized_rows (the r13 Arrow normalize kernel) is BIT-identical
    to the Catalyst transform/try_divide expression it replaced, on real
    data and on the pathological battery (zero vectors, underflow,
    NULL element, NULL vector, inf, overflow, -0.0). The one documented
    boundary artifact: a NaN component surfaces as NULL in nv (Arrow
    nan-as-null on the pandas->JVM hop) — both forms read back as NaN
    through np.asarray in the downstream verify kernels."""
    import math
    import struct

    from pyspark.sql import functions as F

    from pysparkflow.functions.vector import l2_norm
    from pysparkflow.llmops.similarity import _normalized_rows

    path = spark.createDataFrame(
        [
            (100001, [0.0] * 64),
            (100002, [1e-200] * 64),
            (100003, [float("nan")] + [1.0] * 63),
            (100004, [None] + [1.0] * 63),
            (100005, None),
            (100006, [float("inf")] + [1.0] * 63),
            (100007, [-0.0] * 64),
            (100008, [1e200] * 64),
        ],
        "vec_id long, embedding array<double>",
    )
    for df in (emb, path):
        old = df.select(
            F.col("vec_id").alias("id"),
            F.transform(
                F.col("embedding"),
                lambda x: F.coalesce(
                    F.try_divide(x.cast("double"), l2_norm(F.col("embedding"))),
                    F.lit(0.0),
                ),
            ).alias("nv"),
        )
        o = {r["id"]: r["nv"] for r in old.collect()}
        n = {
            r["id"]: r["nv"]
            for r in _normalized_rows(df, "vec_id", "embedding").collect()
        }
        assert o.keys() == n.keys()
        for k in o:
            a, b = o[k], n[k]
            if a is None or b is None:
                assert a is None and b is None, k
                continue
            assert len(a) == len(b), k
            for x, y in zip(a, b):
                if x is not None and math.isnan(x):
                    # documented boundary artifact: NaN -> NULL in nv
                    assert y is None or math.isnan(y), (k, x, y)
                    continue
                assert struct.pack("<d", x) == struct.pack("<d", y), (k, x, y)
