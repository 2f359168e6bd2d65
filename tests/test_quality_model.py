"""Quality-classifier curation gate (llmops/quality_model.py).

The contract: sigmoid of a literal-weight linear model over the rounded
surface features, map-only (zero exchanges), decision replayable from
the published score column.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pysparkflow.llmops.quality_model import (
    QUALITY_WEIGHTS,
    quality_classify,
    quality_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hand_score(text: str) -> float:
    toks = text.strip().split()
    n_tokens = len(toks)
    n_chars = len(text)
    atl = round(n_chars / n_tokens, 4)
    punct = sum(text.count(c) for c in ".,;:!?")
    digit = sum(text.count(c) for c in "0123456789")
    stop = (
        text.count(" the ") + text.count(" and ") + text.count(" of ")
    )
    w = QUALITY_WEIGHTS
    z = (
        w["intercept"]
        + w["log_tokens"] * math.log(1.0 + n_tokens)
        + w["avg_token_len"] * atl
        + w["punct_ratio"] * round(punct / n_chars, 4)
        + w["digit_ratio"] * round(digit / n_chars, 4)
        + w["stopword_ratio"] * round(stop / n_tokens, 4)
    )
    return round(1.0 / (1.0 + math.exp(-z)), 6)


def test_score_matches_hand_computation(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog and runs off",
        "serial 12345 67890 12345 67890 12345",
        "short text",
        "a fluent paragraph where the words flow and the meaning of it all holds",
    ]
    docs = _docs(spark, list(enumerate(texts)))
    got = {r.id: r.q_score for r in quality_scores(docs).collect()}
    for i, t in enumerate(texts):
        assert abs(got[i] - _hand_score(t)) < 1e-9, (i, got[i], _hand_score(t))


def test_fluent_text_outscores_numeric_junk(spark):
    docs = _docs(
        spark,
        [
            (1, "the meaning of the story and the shape of the plot and the rest"),
            (2, "93842 11 00 4827 382 17 999 283 47 58 62"),
        ],
    )
    got = {r.id: r.q_score for r in quality_scores(docs).collect()}
    assert got[1] > got[2]


def test_keep_is_threshold_on_rounded_score(spark):
    docs = _docs(spark, [(i, f"doc number {i} with the words and the rest of it " * (1 + i % 7)) for i in range(40)])
    out = quality_classify(docs, threshold=0.5).collect()
    assert all(r.keep == (r.q_score >= 0.5) for r in out)
    assert len(out) == 40


def test_plan_is_map_only(spark):
    """The gate must add ZERO shuffles: no Exchange anywhere in the
    physical plan — scoring 100 TB is a pure scan-side projection."""
    docs = _docs(spark, [(1, "the text and the rest of it")])
    plan = (
        quality_classify(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_partition_invariant(spark):
    docs = _docs(spark, [(i, f"words {i} of the day and the night " * (1 + i % 5)) for i in range(60)])
    a = sorted(map(tuple, quality_classify(docs).collect()))
    b = sorted(map(tuple, quality_classify(docs.repartition(13)).collect()))
    assert a == b
