"""Eval-set decontamination: overlap flagging, clean-corpus anti-join,
and the broadcast-probe scale contract."""

from __future__ import annotations

from pysparkflow.llmops.decontam import contamination_hits, decontaminate


def _frames(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "he saw the quick brown fox running away"),  # shares 2 4-grams
            (2, "completely unrelated words in this one here"),
            (3, "tiny doc"),  # < n tokens -> no shingles, never flagged
            (4, "the quick brown fox jumps over the lazy dog indeed"),  # near-copy
        ],
        "doc_id long, text string",
    )
    return corpus, ev


def test_contamination_hits_counts_distinct_overlap(spark):
    corpus, ev = _frames(spark)
    got = {r.id: r.n_hits for r in contamination_hits(corpus, ev, n=4).collect()}
    # doc 1: "the quick brown fox" + "saw the quick brown"? eval has only
    # shingles from its own text — overlap = {"the quick brown fox"} plus
    # any other 4-gram both contain
    assert set(got) == {1, 4}
    assert got[4] >= 5  # near-copy shares most of the eval shingles
    assert 1 <= got[1] <= 2


def test_decontaminate_removes_flagged_docs(spark):
    corpus, ev = _frames(spark)
    kept = {r.doc_id for r in decontaminate(corpus, ev, n=4).collect()}
    assert kept == {2, 3}


def test_decontaminate_disjoint_eval_keeps_all(spark):
    corpus, _ = _frames(spark)
    ev = spark.createDataFrame(
        [(200, "zzz yyy xxx www vvv uuu")], "doc_id long, text string"
    )
    assert decontaminate(corpus, ev, n=4).count() == corpus.count()


def test_contamination_probe_is_broadcast(spark):
    """The eval shingle set must ship as a broadcast — a shuffled join
    here would reshuffle the exploded 100 TB corpus."""
    corpus, ev = _frames(spark)
    plan = (
        contamination_hits(corpus, ev, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
