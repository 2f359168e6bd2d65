"""Information-theoretic dependence audit: mutual information between
two categorical columns.

The dataset-audit primitive PSI (llmops/drift.py) does not cover: PSI
asks "did ONE distribution move between snapshots"; mutual information
asks "are TWO columns of the same snapshot dependent" — the standard
check before stratifying, splitting, or deduplicating on a column
('is event mix confounded with time-of-day?', 'does source predict
language?'). A near-zero MI certifies a column as a safe hash-split
key; a large MI flags leakage between a feature and a label.

Scale shape: ONE codegen'd conditional-count pass over the corpus
(groupBy(x, y).count — the only corpus-sized exchange); marginals,
totals and every log term then run on the |X|x|Y| contingency table
(window functions over at most a few thousand rows). Nothing is
collected; the output is one row per X value. This mirrors psi_drift's
"aggregate once, compute on the contingency" contract
(llmops/drift.py), which is the only shape that survives 100 TB —
the corpus is touched exactly once.

Cross-engine lockstep (the bm25/psi family discipline): natural ln,
counts CAST to DOUBLE before any multiply (c_xy * n overflows BIGINT at
real scale), round(, 6) only on the final sums. Keep the Spark
expressions and the registry oracle SQL textually parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mutual_information(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Per-``x_col``-value mutual-information contributions against
    ``y_col``: for each cell, term = p_xy * ln(p_xy / (p_x * p_y)),
    summed over y within x. The total MI of the pair of columns is the
    sum of the ``mi_contrib`` column; emitting per-x rows keeps the
    result joinable back to the data (e.g. 'which event_type carries
    the time-of-day signal').

    Null categories are kept as their own level (a null event_type is
    signal, not noise); the count pass groups them like any value.

    Returns (x, n_x, mi_contrib) with x aliased to ``x_col``.
    """
    cells = df.groupBy(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count("*").alias("c_xy"))
    # everything below runs on the contingency table (|X| x |Y| rows)
    wx = Window.partitionBy("_x")
    wy = Window.partitionBy("_y")
    wall = Window.partitionBy()
    terms = cells.select(
        "_x",
        "c_xy",
        F.sum("c_xy").over(wx).alias("c_x"),
        F.sum("c_xy").over(wy).alias("c_y"),
        F.sum("c_xy").over(wall).alias("n"),
    ).select(
        "_x",
        "c_x",
        (
            (F.col("c_xy").cast("double") / F.col("n").cast("double"))
            * F.log(
                (F.col("c_xy").cast("double") * F.col("n").cast("double"))
                / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
            )
        ).alias("term"),
    )
    return (
        terms.groupBy(F.col("_x").alias(x_col))
        .agg(
            F.max("c_x").cast("long").alias("n_x"),
            F.round(F.sum("term"), 6).alias("mi_contrib"),
        )
        .orderBy(x_col)
    )
