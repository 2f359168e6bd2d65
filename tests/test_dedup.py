"""Dedup operator tests: exact groups, n-gram Jaccard, MinHash-LSH accuracy
vs exact Jaccard, SimHash locality."""

from __future__ import annotations


from pysparkflow.llmops.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river delta"),  # near dup
    (4, "completely different words about spark dataframes and shuffles here"),
    (5, "another unrelated document mentioning parquet files and predicate pushdown"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark):
    got = exact_duplicates(_docs(spark)).collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 2
    assert got[0]["keep_id"] == 1


def test_ngram_jaccard_pairs(spark):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.5).collect()
    }
    assert got[(1, 2)] == 1.0  # identical docs
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0  # near dup
    assert (1, 4) not in got and (4, 5) not in got


def test_minhash_lsh_matches_exact_jaccard(spark):
    """LSH candidates that survive verification must carry the exact
    Jaccard value; high-similarity pairs must be found."""
    exact = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.0).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert (1, 2) in lsh and lsh[(1, 2)] == 1.0
    assert (1, 3) in lsh  # J≈0.85 — must survive 8-band LSH
    for pair, j in lsh.items():
        assert exact[pair] == j  # verified value is the true Jaccard


def test_simhash_locality(spark):
    sigs = {r["id"]: r["simhash"] for r in simhash_signatures(_docs(spark)).collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert sigs[1] == sigs[2]  # identical docs, identical fingerprint
    assert hamming(sigs[1], sigs[3]) < hamming(sigs[1], sigs[4])  # locality


def test_minhash_on_real_documents(spark, sf_dir):
    """On the real documents table, every LSH-found pair above threshold
    must also be present in the exhaustive n-gram pair set."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.7).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.7).collect()
    }
    assert lsh <= exact
    # 8 bands × 4 rows at J>=0.9 → P(miss) < 1e-6; demand full recall there
    strong = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.9).collect()
    }
    assert strong <= lsh


def test_dedup_resolution_transitive_chains(spark):
    """A~B and B~C puts all three in one cluster with the min id kept,
    even though A~C was never a pair; disjoint pairs stay separate."""
    from pysparkflow.llmops.dedup import dedup_resolution

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    got = {r.doc_id: r.keep_id for r in dedup_resolution(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
    }
    # the size-gated driver union-find (n_pairs known and small) must
    # produce the identical mapping as the distributed closure above
    fast = {
        r.doc_id: r.keep_id for r in dedup_resolution(pairs, n_pairs=6).collect()
    }
    assert fast == got


def test_incremental_exact_flags(spark):
    from pysparkflow.llmops.dedup import incremental_exact_flags

    corpus = spark.createDataFrame(
        [(1, "seen before"), (2, "also known")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "seen before"), (11, "brand new"), (12, "also known")],
        "doc_id long, text string",
    )
    got = {r.id: r.known_dup for r in incremental_exact_flags(new, corpus).collect()}
    assert got == {10: True, 11: False, 12: True}


def test_incremental_minhash_flags(spark):
    from pysparkflow.llmops.dedup import incremental_minhash_flags

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows_corpus = [
        (0, base),
        (2, "completely different words about spark shuffles and partitions here"),
        (4, base.replace("today", "tonight")),  # near-dup of 0, same side
    ]
    rows_new = [
        (1, base),  # exact copy of corpus 0: J=1, every band collides
        (3, "nothing like anything in the standing corpus at all whatsoever"),
    ]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    out = incremental_minhash_flags(
        mk(rows_new), mk(rows_corpus), threshold=0.3
    ).collect()
    flagged = {r["id"]: (r["match_id"], r["jaccard"]) for r in out}
    # doc 1 matches the corpus; best match is max-J with min-id tie-break
    # (doc 0 at J=1.0 beats the tonight-variant doc 4)
    assert flagged.get(1) == (0, 1.0), flagged
    # doc 3 is clean -> absent; corpus-side docs never appear as ids
    # (the 0~4 near-dup pair is same-side and must not flag)
    assert set(flagged) == {1}
    # one row per flagged doc (best match only)
    assert len(out) == 1


def test_simhash_near_dups_matches_bruteforce(spark):
    """Byte-band + verify must equal an all-pairs Hamming scan over the
    signatures (complete for hamming < 8 by pigeonhole)."""
    import itertools

    from pysparkflow.llmops.dedup import simhash_near_dups, simhash_signatures

    base = "the quick brown fox jumps over the lazy dog near the river bank " * 4
    rows = [(i, f"{base} tail{i % 5} word{i % 7}") for i in range(30)]
    rows += [(100, rows[0][1]), (101, rows[1][1])]  # exact copies: hamming 0
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = {r["id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    expect = {
        (a, b, bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1"))
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= 7
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dups(docs, max_hamming=7).collect()
    }
    assert got == expect
    assert (0, 100, 0) in got and (1, 101, 0) in got  # planted exact copies
