"""Distributed BPE merge statistics: the pair-counting round at the
heart of byte-pair-encoding tokenizer training.

Training a BPE tokenizer over a 100 TB corpus is iterative: count every
adjacent symbol pair, merge the most frequent, repeat. The expensive
part — and the part that must be distributed — is the pair count over
the corpus. This module implements one counting round Spark-first:

    words   = explode(tokenize(text))           -- map-only
    symbols = split word into chars              -- map-only
    pairs   = zip symbols with their successor   -- map-only (no window:
              the pairing happens INSIDE the word array via transform(),
              never across rows, so there is no per-token shuffle)
    counts  = groupBy pair -> sum(word_freq)     -- the one shuffle,
              pre-collapsed by the word-frequency dictionary

The word-frequency dictionary trick is the standard one: identical words
pair identically, so counting distinct words first (vocab-sized) and
weighting pair counts by word frequency makes the pair stage independent
of corpus size. The subsequent merge rounds operate on that dictionary —
driver-sized for any natural-language vocabulary.

The whole thing is Catalyst higher-order functions over arrays — no
Python UDFs, no window, one shuffle per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) dictionary over the corpus — lowercased alpha
    tokens. The vocab-sized table every BPE round recounts against."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-character pair counts weighted by word frequency:
    (lhs, rhs, n). The in-array zip keeps pairing map-side."""
    pairs = F.expr(
        "transform(slice(split(word, ''), 1, length(word) - 1), "
        "(c, i) -> struct(c AS lhs, element_at(split(word, ''), i + 2) AS rhs))"
    )
    return (
        words.filter(F.length("word") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("n"))
    )


def top_merge_candidates(
    docs: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """The first BPE merge round's top-k candidate pairs over the
    corpus, deterministic order (count desc, then pair).
    Returns (lhs, rhs, n, rank)."""
    from pyspark.sql import Window

    counts = pair_counts(word_frequencies(docs, text_col))
    w = Window.orderBy(
        F.col("n").desc(), F.col("lhs").asc(), F.col("rhs").asc()
    )
    # the rank window runs on the vocab-pair table (alphabet^2-sized at
    # round 0), not the corpus — single partition is correct there
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lhs", "rhs", "n", F.col("rank").cast("int").alias("rank"))
    )
