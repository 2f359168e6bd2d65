"""Property-based checks for the training-pipeline operators: random
document corpora, invariants that must hold for ANY input. Example
counts stay small — every example is a distributed run."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from pysparkflow.session import get_spark

        _spark = get_spark(
            app_name="pysparkflow-llmprop", master="local[4]", shuffle_partitions=4
        )
    return _spark


_word = st.text(alphabet="abcdef", min_size=1, max_size=3)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@settings(max_examples=10, deadline=None)
@given(_corpus)
def test_packing_tiles_every_corpus(texts):
    """For ANY corpus: every doc placed exactly once, and reconstructed
    start offsets tile each bucket with no gaps or overlaps."""
    from pysparkflow.llmops.packing import pack_documents

    spark = _get_spark()
    out = pack_documents(_docs_df(spark, texts), budget=7, n_buckets=3).collect()
    assert len(out) == len(texts)
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r.example_id * 7 + r.offset)
        run = 0
        for r in rows:
            assert r.example_id * 7 + r.offset == run
            run += r.n_tokens


@settings(max_examples=10, deadline=None)
@given(_corpus, st.integers(0, 100))
def test_stratified_sample_is_stable_subset(texts, pct):
    """For ANY corpus and rate: the sample is a subset, and re-sampling
    at a higher rate only ever ADDS rows (nested samples — the property
    that makes deterministic-hash sampling safe for incremental reruns)."""
    from pysparkflow.llmops.sampling import stratified_sample

    spark = _get_spark()
    docs = _docs_df(spark, texts).withColumn("lang", F.lit("xx"))
    rate = pct / 100
    if rate == 0:
        return
    lo = {r.doc_id for r in stratified_sample(docs, {}, default_rate=rate).collect()}
    hi = {
        r.doc_id
        for r in stratified_sample(
            docs, {}, default_rate=min(1.0, rate + 0.3)
        ).collect()
    }
    all_ids = {r.doc_id for r in docs.collect()}
    assert lo <= hi <= all_ids


@settings(max_examples=10, deadline=None)
@given(_corpus)
def test_repetition_fractions_bounded(texts):
    """For ANY corpus: all repetition signals are valid fractions, and a
    doc of one repeated token hits the extremes."""
    from pysparkflow.llmops.textstats import repetition_features

    spark = _get_spark()
    rows = repetition_features(_docs_df(spark, texts)).collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert 0.0 <= r.dup_2gram_frac <= 1.0
        assert 0.0 <= r.dup_3gram_frac <= 1.0
        assert 0.0 < r.top_word_frac <= 1.0


@settings(max_examples=8, deadline=None)
@given(_corpus, _corpus)
def test_decontaminate_partitions_corpus(corpus_texts, eval_texts):
    """For ANY corpus/eval pair: flagged + clean partitions the corpus,
    and a doc sharing zero 2-grams with eval is never flagged."""
    from pysparkflow.llmops.decontam import contamination_hits, decontaminate

    spark = _get_spark()
    corpus = _docs_df(spark, corpus_texts)
    ev = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(eval_texts)], "doc_id long, text string"
    )
    flagged = {r.id for r in contamination_hits(corpus, ev, n=2).collect()}
    clean = {r.doc_id for r in decontaminate(corpus, ev, n=2).collect()}
    all_ids = {r.doc_id for r in corpus.collect()}
    assert flagged | clean == all_ids
    assert flagged & clean == set()


_vec = st.lists(
    st.floats(min_value=-4.0, max_value=4.0, allow_nan=False, width=32),
    min_size=4, max_size=4,
)
_emb_corpus = st.lists(_vec, min_size=3, max_size=14)


@settings(max_examples=8, deadline=None)
@given(_emb_corpus, st.floats(min_value=0.1, max_value=0.99))
def test_semantic_dedup_invariants_any_corpus(vecs, threshold):
    """For ANY embedding corpus (including zero vectors and duplicate
    directions) and any threshold: one output row per vector; every
    cluster's minimum id has a NULL prior (and is kept); the keep flag
    replays from the published rounded column; chunking is
    answer-invariant (chunk_rows=2 forces cross-block pairs in both id
    directions; chunk_rows=10^6 puts each cluster in one block)."""
    from pysparkflow.llmops.semdedup import semantic_dedup

    spark = _get_spark()
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    k = min(2, len(vecs))
    out = semantic_dedup(
        emb, k=k, rounds=2, threshold=threshold, chunk_rows=2
    ).collect()
    assert len(out) == len(vecs)
    rows = {r["id"]: r for r in out}
    for cluster in {r["cluster"] for r in out}:
        first = min(i for i, r in rows.items() if r["cluster"] == cluster)
        assert rows[first]["max_prior_cosine"] is None
        assert rows[first]["keep"] is True
    for r in out:
        m = r["max_prior_cosine"]
        assert r["keep"] == (m is None or m < threshold)
        if m is not None:
            assert -1.0 - 1e-9 <= m <= 1.0 + 1e-9
    big = semantic_dedup(
        emb, k=k, rounds=2, threshold=threshold, chunk_rows=1_000_000
    ).collect()
    assert {r["id"]: (r["cluster"], r["max_prior_cosine"], r["keep"])
            for r in big} == {
        r["id"]: (r["cluster"], r["max_prior_cosine"], r["keep"]) for r in out
    }
