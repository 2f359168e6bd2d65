"""Blocked string-similarity self-join (edit distance).

Fuzzy matching over a string column without the all-pairs cross join:

1. **Dictionary reduction** — distinct values first. Corpus-scale string
   columns are heavily repeated (names, labels, titles); pairing the
   *vocabulary* is orders of magnitude smaller than pairing rows, and
   row-level matches are recoverable by joining back on the value.
2. **Blocking** — candidate pairs must agree on a cheap signature
   (here: same token suffix + length within ``max_dist``). A true match
   under edit distance ``d`` can differ in length by at most ``d``, so
   the length band is lossless; the suffix block is the recall/cost
   knob, the same banding idea as MinHash-LSH (llmops/dedup.py) applied
   to edit distance.
3. **Verify** — exact ``levenshtein`` (JVM built-in, codegen'd) only on
   blocked candidates.

Scale shape: the join key is (block, length-band), so the shuffle is
vocabulary-sized; no stage is quadratic in the corpus. Skewed blocks
(one giant suffix bucket) are the pathological case — pick a finer
block or salt it (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 3,
    suffix_len: int = 4,
) -> DataFrame:
    """Distinct-value pairs (a < b) within ``max_dist`` edits that share
    a ``suffix_len``-char suffix. Returns (a, b, dist)."""
    vocab = df.select(F.col(col).alias("a")).distinct()
    left = vocab.withColumn("blk", F.substring(F.col("a"), -suffix_len, suffix_len))
    right = (
        vocab.select(F.col("a").alias("b"))
        .withColumn("blk", F.substring(F.col("b"), -suffix_len, suffix_len))
    )
    return (
        left.join(right, "blk")
        .filter(
            (F.col("a") < F.col("b"))
            & (
                F.abs(F.length("a") - F.length("b")) <= max_dist
            )
        )
        .withColumn("dist", F.levenshtein("a", "b"))
        .filter(F.col("dist") <= max_dist)
        .select("a", "b", "dist")
    )
