"""Independent numpy recomputation of the knn_ivf / knn_ivf_recall pins.

The IVF queries are approximate-by-construction but fully deterministic:
hash-ordered centroid sample (portable md5 order — reproducible here with
hashlib, no Spark), seeded numpy init, fixed Lloyd iterations, id
tie-breaks. This module recomputes the graded sf0.01 results from the
parquet file alone, so the literals pinned in
relational/registry.py (_KNN_IVF_PINNED_ROWS, _Q_KNN_IVF_RECALL_SQL) are
DERIVED, not transcribed engine output — tests/test_similarity.py asserts
the registry pins equal this oracle's output.

Usage: python tools/ivf_oracle.py [embeddings.parquet]
Prints the pinned-row literal and the recall triple.
"""

from __future__ import annotations

import hashlib
import sys

import numpy as np
import pyarrow.parquet as pq


def portable_hash32(s: str) -> int:
    """functions.text.portable_hash32 on a string column: hex word 0 of
    md5, parsed as an integer."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def fit_centroids(ids: np.ndarray, X: np.ndarray, n_cells: int, seed: int,
                  sample_rows: int = 4096) -> np.ndarray:
    """Mirror of llmops.similarity._fit_centroids_sample with id_col set:
    sample ordered by (portable_hash32(f"{id}:{seed}"), id)."""
    keys = np.asarray([portable_hash32(f"{i}:{seed}") for i in ids])
    order = np.lexsort((ids, keys))[:sample_rows]
    S = X[order].astype(np.float64)
    S = S / np.linalg.norm(S, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    C = S[rng.choice(len(S), size=min(n_cells, len(S)), replace=False)]
    for _ in range(8):
        assign = (S @ C.T).argmax(axis=1)
        for k in range(len(C)):
            members = S[assign == k]
            if len(members):
                c = members.mean(axis=0)
                C[k] = c / (np.linalg.norm(c) or 1.0)
    return C


def knn_ivf(ids: np.ndarray, X: np.ndarray, query_ids: np.ndarray,
            k: int = 5, n_cells: int = 16, n_probe: int = 4,
            seed: int = 42) -> list[tuple[int, int, float, int]]:
    """Mirror of llmops.similarity.knn_ivf over the full table."""
    C = fit_centroids(ids, X, n_cells, seed)
    Xd = X.astype(np.float64)
    scores = Xd @ C.T                     # dot with unit centroids
    cell = scores.argmax(axis=1)          # first max, same as argmax
    norms = np.linalg.norm(Xd, axis=1)
    out = []
    id_to_ix = {int(i): ix for ix, i in enumerate(ids)}
    for qid in query_ids:
        qx = id_to_ix[int(qid)]
        # top n_probe cells by score desc, tie by cell desc (Spark's
        # reverse(array_sort(struct(s, cell))) ordering)
        probe = sorted(range(len(C)), key=lambda c: (-scores[qx, c], -c))[:n_probe]
        cand = [ix for ix in range(len(ids))
                if cell[ix] in set(probe) and ids[ix] != qid]
        cos = [(float(Xd[ix] @ Xd[qx] / (norms[ix] * norms[qx])), int(ids[ix]))
               for ix in cand]
        cos.sort(key=lambda t: (-t[0], t[1]))
        for rank, (c, iid) in enumerate(cos[:k], start=1):
            out.append((int(qid), iid, round(c, 4), rank))
    return out


def knn_bruteforce(ids: np.ndarray, X: np.ndarray, query_ids: np.ndarray,
                   k: int = 5) -> set[tuple[int, int]]:
    Xd = X.astype(np.float64)
    norms = np.linalg.norm(Xd, axis=1)
    id_to_ix = {int(i): ix for ix, i in enumerate(ids)}
    out = set()
    for qid in query_ids:
        qx = id_to_ix[int(qid)]
        cos = [(float(Xd[ix] @ Xd[qx] / (norms[ix] * norms[qx])), int(ids[ix]))
               for ix in range(len(ids)) if ids[ix] != qid]
        cos.sort(key=lambda t: (-t[0], t[1]))
        out |= {(int(qid), iid) for _, iid in cos[:k]}
    return out


def cluster_balanced_sample(ids: np.ndarray, X: np.ndarray, per_cell: int = 5,
                            n_cells: int = 16, seed: int = 42) -> list[tuple[int, int, int]]:
    """Mirror of llmops.similarity.cluster_balanced_sample: (id, cell, rk)."""
    C = fit_centroids(ids, X, n_cells, seed)
    Xd = X.astype(np.float64)
    cell = (Xd @ C.T).argmax(axis=1)
    out = []
    for c in range(n_cells):
        members = [int(i) for i in ids[cell == c]]
        members.sort(key=lambda i: (portable_hash32(f"{i}:{seed}"), i))
        for rk, i in enumerate(members[:per_cell], start=1):
            out.append((i, int(c), rk))
    return out


def compute_pins(path: str) -> tuple[list[tuple[int, int, float, int]], tuple[int, int, float]]:
    t = pq.read_table(path)
    ids = np.asarray(t["vec_id"])
    X = np.asarray([np.asarray(v, dtype=np.float32) for v in t["embedding"].to_pylist()])
    qids = ids[ids < 3]
    pins = knn_ivf(ids, X, qids, k=5, n_cells=16, n_probe=4)
    bf = knn_bruteforce(ids, X, qids, k=5)
    ivf8 = knn_ivf(ids, X, qids, k=5, n_cells=16, n_probe=8)
    hits = {(q, i) for q, i, _, _ in ivf8} & bf
    recall = (len(bf), len(hits), round(len(hits) / len(bf), 4))
    return pins, recall


def compute_cluster_sample_pins(path: str) -> list[tuple[int, int, int]]:
    t = pq.read_table(path)
    ids = np.asarray(t["vec_id"])
    X = np.asarray([np.asarray(v, dtype=np.float32) for v in t["embedding"].to_pylist()])
    return cluster_balanced_sample(ids, X)


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01/embeddings.parquet"
    pins, (n_true, n_hit, recall) = compute_pins(path)
    print("_KNN_IVF_PINNED_ROWS = [")
    for row in pins:
        print(f"    {row},")
    print("]")
    print(f"recall: n_true={n_true} n_hit={n_hit} recall={recall}")
    cs = compute_cluster_sample_pins(path)
    print("_CLUSTER_SAMPLE_PINNED_ROWS = [")
    for row in cs:
        print(f"    {row},")
    print("]")


if __name__ == "__main__":
    main()
