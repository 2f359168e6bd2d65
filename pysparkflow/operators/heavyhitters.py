"""Sketch-accelerated EXACT heavy hitters (frequent items).

The two-pass candidate-pruning pattern for high-cardinality frequency
queries: a plain ``groupBy(key).count().having(...)`` shuffles every
distinct key — at 100 TB that is the long tail (billions of URLs,
tokens, user ids), almost all of which can never reach the support
threshold. Instead:

1. **candidate pass**: Spark's ``df.stat.freqItems`` (the
   Karp–Papadimitriou–Shenker one-pass counter, JVM treeAggregate — no
   shuffle at all) returns a SUPERSET of every item with frequency
   above ``support``; the candidate list is bounded by 1/support
   regardless of data size, so it always fits the driver;
2. **exact pass**: count ONLY rows matching a candidate (broadcast semi
   join — map-side prune fused into the scan), then keep counts >=
   ``min_count``.

The KPS superset guarantee makes the OUTPUT exact and deterministic —
independent of partition layout even though the candidate SET is not —
so this entry takes the full hash-match oracle (a plain GROUP BY ...
HAVING replay), unlike the banded sketch entries (approx_distinct):
the sketch here accelerates the plan, it never touches the answer.

The only corpus-sized shuffle left is over candidate-matching rows
(<= min_count' worth of keys x their rows after the map-side partial
aggregation — i.e. at most 1/support groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# freqItems' documented lower bound on support
_MIN_SUPPORT = 1e-4


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    total_rows: int | None = None,
) -> DataFrame:
    """Exact (key, n_rows) for every key appearing at least ``min_count``
    times, via KPS candidate pruning + exact verification.

    ``total_rows``: pass the NON-NULL-key row count when already known
    to skip the count job (the support fraction needs it; an all-rows
    count merely shrinks the support, which keeps the candidate pass a
    sound superset — but callers deriving ``min_count`` from the same n
    must use the non-null universe or their threshold diverges from a
    GROUP BY HAVING oracle).

    Null keys are excluded up front on BOTH plans (the pruned path's
    left_semi join would drop a null-key group the exact path kept —
    ADVICE r7), matching the SQL-oracle convention that GROUP BY keys
    of interest are non-null."""
    df = df.where(F.col(key_col).isNotNull())
    exact = (
        df.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("n_rows"))
        .where(F.col("n_rows") >= min_count)
    )
    n = total_rows if total_rows is not None else df.count()
    # KPS guarantees completeness only for counts STRICTLY above
    # n*support — aim support just under min_count/n. If the threshold
    # sits below freqItems' documented support floor, pruning would be
    # UNSOUND (a qualifying key could be missed): take the plain exact
    # plan instead — correctness gates the optimization, never the
    # reverse. Above 1.0 (min_count > n) freqItems would raise; the
    # exact plan correctly returns no rows (ADVICE r7).
    support = (min_count - 0.5) / n if n else 0.0
    if support < _MIN_SUPPORT or support > 1.0:
        return exact
    cands = df.stat.freqItems([key_col], support).collect()[0][0]
    spark = df.sparkSession
    cand_df = spark.createDataFrame(
        [(c,) for c in cands], df.select(key_col).schema
    ).withColumnRenamed(key_col, "key")
    return (
        df.select(F.col(key_col).alias("key"))
        .join(F.broadcast(cand_df), "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("n_rows"))
        .where(F.col("n_rows") >= min_count)
    )
