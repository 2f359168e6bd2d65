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


def test_lsh_verify_probes_index_without_sort_merge(spark):
    """Small candidate sets: the candidate prune and Jaccard verify must
    probe the persisted inverted index via broadcast joins — the r13
    before-plan re-ran the lazy semi-join prune per consumer, planning
    8 SortMergeJoin LeftSemi exchanges of the full index (persisted
    inputs carry no size statistics, so Catalyst never broadcasts them
    unaided)."""
    from pysparkflow.llmops.dedup import incremental_minhash_flags

    docs = _docs(spark)
    for out in (
        minhash_lsh_pairs(docs, threshold=0.5),
        incremental_minhash_flags(
            docs.where("doc_id % 2 = 1"), docs.where("doc_id % 2 = 0"),
            threshold=0.3,
        ),
    ):
        plan = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # the band-bucket self-join (candidate generation over the
        # corpus-sized banded index) legitimately stays a shuffle join;
        # the prune and verify must not
        assert "SortMergeJoin LeftSemi" not in plan, plan[:2000]
        assert "ShuffledHashJoin LeftSemi" not in plan, plan[:2000]


def test_incremental_minhash_fused_pass_matches_per_side(spark):
    """The fused one-scan shingle pass (side tag + keyed signature agg)
    must reproduce the two-per-side computation exactly: same flags,
    same best match, same jaccard."""
    from pysparkflow.llmops.dedup import (
        _jaccard_verify,
        _minhash_band_rows,
        _minhash_sig_from_hashed,
        _shingle_pairs_hashed,
    )
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),
        (2, "completely different words about spark shuffles and partitions here"),
        (3, "nothing like anything in the standing corpus at all whatsoever"),
        (4, base.replace("today", "tonight")),
        (5, base.replace("dog", "cat")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    new_docs = docs.where("doc_id % 2 = 1")
    corpus = docs.where("doc_id % 2 = 0")

    # reference: the pre-fusion per-side pipeline, inlined
    num_hashes, bands, r = 32, 8, 4
    sh_new = _shingle_pairs_hashed(new_docs, "doc_id", "text", 3)
    sh_old = _shingle_pairs_hashed(corpus, "doc_id", "text", 3)
    b_new = _minhash_band_rows(
        _minhash_sig_from_hashed(sh_new, num_hashes, 42), bands, r
    )
    b_old = _minhash_band_rows(
        _minhash_sig_from_hashed(sh_old, num_hashes, 42), bands, r
    )
    cands = (
        b_new.select(F.col("id").alias("id_a"), "band", "bucket")
        .join(b_old.select(F.col("id").alias("id_b"), "band", "bucket"),
              ["band", "bucket"])
        .select("id_a", "id_b")
        .distinct()
    )
    sh = sh_new.unionByName(sh_old).select("id", "sh")
    ref = {
        (r2["id_a"], r2["id_b"]): round(r2["jaccard"], 9)
        for r2 in _jaccard_verify(sh, 0.3, cands=cands).collect()
    }

    from pysparkflow.llmops.dedup import incremental_minhash_flags

    got_rows = incremental_minhash_flags(new_docs, corpus, threshold=0.3).collect()
    # every flagged (id, match_id, jaccard) must appear in the reference
    # pair scores, and the best-match selection must agree with a driver
    # recomputation over the reference
    best = {}
    for (ia, ib), j in ref.items():
        cur = best.get(ia)
        if cur is None or (j, -ib) > (cur[1], -cur[0]):
            best[ia] = (ib, j)
    got = {r2["id"]: (r2["match_id"], round(r2["jaccard"], 9)) for r2 in got_rows}
    assert got == best, (got, best)
