"""Corpus-model language scoring: unigram log-probability per document.

A standard cheap quality/fluency signal for pretraining curation: build
a unigram LM from the corpus itself (token -> ln(count/total)), then
score each document by the mean log-probability of its tokens. Gibberish
and boilerplate-heavy documents score low; typical prose scores near the
corpus mode. (The n-gram generalization only changes the tokenizer; the
dataflow is identical.)

Dataflow (all JVM-side, no Python UDFs):

    tokens   = explode(split(lower(text)))            -- map-only
    model    = tokens groupBy token -> count, ln(p)   -- vocab-sized agg
    scores   = tokens (broadcast-)join model          -- vocab is small
               groupBy doc -> avg(lp)

Scale shape: the only corpus-sized shuffle is the token-count partial
aggregation (map-side combine collapses it to vocabulary size before the
exchange). The model table is vocabulary-sized, so the score join
broadcasts; the single-partition window that turns counts into
probabilities runs on that same tiny table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def unigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-prob under the corpus's own unigram
    model. Returns (id_col, n_tokens, lm_score).

    The corpus is tokenized ONCE: per-(doc, token) counts are the
    materialized intermediate (tracked persist — doc x vocab sized, far
    smaller than the text) that feeds BOTH the model aggregate and the
    scoring join; without it the two consumers would each re-scan and
    re-tokenize the full corpus, doubling the dominant cost.

    Word model: the shared Unicode-letter-run contract — a token is a
    maximal ``\\p{L}`` run after lower(), in lockstep with the DuckDB
    oracle; see llmops/bpe.py::word_frequencies for the full contract
    incl. the two documented case-fold divergence classes. (The
    whitespace tokenizers — tfidf/bm25/textstats — are script-neutral
    by construction and unaffected.)"""
    from pysparkflow.engine.cache import track

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"[^\p{L}]+")).alias("t"),
    ).filter(F.col("t") != "")
    doc_tok = track(
        toks.groupBy(id_col, "t").agg(F.count("*").alias("n"))
    )
    # vocab-sized: the unpartitioned window runs on one executor over a
    # few thousand rows, not the corpus
    model = (
        doc_tok.groupBy("t")
        .agg(F.sum("n").alias("cnt"))
        .withColumn(
            "lp",
            F.log(F.col("cnt") / F.sum("cnt").over(Window.partitionBy())),
        )
        .select("t", "lp")
    )
    # weighted mean over the compacted counts == plain mean over tokens
    return (
        doc_tok.join(F.broadcast(model), "t")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_tokens"),
            F.round(
                F.sum(F.col("n") * F.col("lp")) / F.sum("n"), 4
            ).alias("lm_score"),
        )
    )
