"""As-of join — an operator Spark lacks natively, composed from built-ins
(no Pandas UDF needed): for every left row, attach the latest right row
with ``right_ts <= left_ts`` within the same key.

Implementation: tag + union + one window pass. Right rows and left rows
interleave in a single (key, ts)-ordered stream; ``last(right payload,
ignoreNulls)`` over rows-unbounded-preceding carries the most recent right
row forward onto each left row. One shuffle on the key — the same cost as
a plain equi-join — versus the naive inequality-join which is O(n·m) per
key. Ties (right_ts == left_ts) match, like DuckDB/pandas ``merge_asof``
with ``direction='backward'``.

Scale: the union stream shuffles once on (key); the window is a
sort-within-partition. Skewed keys behave like any windowed aggregation
(AQE handles partition-level skew; per-key order is required by
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join. Returns all ``left`` columns plus, for each of
    ``right_cols`` (default: all non-key, non-ts right columns),
    ``<col><suffix>`` from the latest right row at-or-before the left
    timestamp, and ``<right_ts><suffix>`` itself (NULL when no right row
    precedes)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    carried = [right_ts] + right_cols

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*carried).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*carried).alias("_r"),
    )
    # right rows sort before left rows at equal ts => ties match (backward)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        l_tag.unionByName(r_tag)
        .withColumn("_carry", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_is_left") == 1)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_carry.{right_ts}").alias(f"{right_ts}{suffix}"))
    out_cols += [F.col(f"_carry.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return merged.select(*out_cols)
