"""Z-order (Morton) clustering keys for multi-dimensional data layout.

At 100 TB the dominant cost is the scan; the dominant scan optimization
is skipping. A table queried by two independent columns (e.g. customer
and date) cannot be range-partitioned to serve both — but sorting by the
Z-order interleave of the two columns' quantile-bucket ranks gives every
file a tight min/max envelope on BOTH dimensions, so either predicate
prunes footer stats.

Dataflow — deliberately NOT a global ``ntile`` window (that is a
single-partition sort, the opposite of the point):

1. one scalar aggregate computes each dimension's ``2^bits - 1``
   interpolated percentile boundaries over a DETERMINISTIC HASH SAMPLE
   of the rows (``sample_key``/``sample_mod``) — bucket boundaries
   don't need exactness, only balance, and exact ``F.percentile`` over
   the full table is an object-agg that buffers every value per
   partition (the scale-killer VERDICT r5 #4 flagged). Sampling for
   range boundaries is exactly what Spark's own RangePartitioner does;
   making the sample a content hash (functions/text.portable_hash32)
   instead of ``rand()`` keeps the whole computation replayable by the
   DuckDB oracle. Quantile buckets make Z-order robust to skew, where
   raw-value interleave would collapse 99% of rows onto one corner of
   the curve. Pass ``sample_key=None`` for small inputs to use every
   row;
2. the boundary arrays broadcast; bucket rank = count of boundaries
   <= value — a map-side higher-order-function scan over a 2^bits array
   (ties at a boundary land in one bucket: deterministic without any
   positional tie-break);
3. the bucket bits interleave into one long ``z`` via a fixed unrolled
   shift-or expression — identical in any engine with integer bit ops,
   which is how the DuckDB oracle replays the whole thing
   (``quantile_cont`` matches ``F.percentile``'s linear interpolation;
   see the approx_quantiles de-pinning note in relational/registry.py).

The caller sorts / ``repartitionByRange``s by ``z`` before writing.

Reference analogue: the reference lays out per-round graph state for
sequential scans (SURVEY §2.1 S4, ff5's SequenceFile round files); this
is the same locality idea applied to multi-predicate analytical scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave the low ``bits`` of ``a`` and ``b``:
    result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        # Column.bitwiseOR, not `|` (PySpark maps `|` to boolean OR)
        z = z.bitwiseOR(
            F.shiftleft((a.bitwiseAND(F.lit(1 << i))).cast("long"), i)
        ).bitwiseOR(
            F.shiftleft((b.bitwiseAND(F.lit(1 << i))).cast("long"), i + 1)
        )
    return z


def interleave_sql(a: str, b: str, bits: int) -> str:
    """The same unrolled interleave as SQL (portable integer bit ops)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} & {1 << i}) << {i})")
        terms.append(f"(({b} & {1 << i}) << {i + 1})")
    return " | ".join(terms)


def _bucket(value: Column, boundaries: Column) -> Column:
    """Rank of ``value`` against a broadcast boundary array: the number
    of boundaries <= value. Map-side; no shuffle, no window."""
    return F.aggregate(
        boundaries,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(b <= value, 1).otherwise(0),
    )


def zorder_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 4,
    sample_key: Column | None = None,
    sample_mod: int = 20,
) -> DataFrame:
    """Add ``z`` — the Morton interleave of the two columns'
    equal-frequency bucket ranks (``2^bits`` buckets per dimension).
    One scalar-aggregate job + a map-only pass; both numeric columns.

    ``sample_key``: a deterministic per-row expression (e.g. the row's
    primary key as a string); when given, the boundary aggregate runs
    over the ~``1/sample_mod`` hash-sample of rows whose
    ``portable_hash32(sample_key) % sample_mod == 0`` — the boundary
    percentiles then buffer only the sample, not the table."""
    from pysparkflow.functions.text import portable_hash32

    n = 1 << bits
    ps = [i / n for i in range(1, n)]
    src = df
    if sample_key is not None:
        src = df.where(
            F.pmod(portable_hash32(sample_key), F.lit(sample_mod)) == 0
        )
    bounds = src.agg(
        F.percentile(col_a, F.array([F.lit(p) for p in ps])).alias("ba"),
        F.percentile(col_b, F.array([F.lit(p) for p in ps])).alias("bb"),
    )
    if sample_key is not None:
        # an EMPTY hash sample (tiny table or unlucky modulus) yields
        # NULL boundary arrays, which would silently make every z NULL.
        # Fail loudly instead — the caller should lower sample_mod or
        # pass sample_key=None; a silent full-table fallback would
        # desync any oracle that replays the sample.
        ok = F.assert_true(
            F.col("ba").isNotNull() & F.col("bb").isNotNull(),
            F.lit(
                "zorder_key: hash sample selected no rows — lower "
                "sample_mod or pass sample_key=None"
            ),
        )
        bounds = bounds.select(
            F.when(ok.isNull(), F.col("ba")).alias("ba"),
            F.when(ok.isNull(), F.col("bb")).alias("bb"),
        )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "z",
            interleave_bits(
                _bucket(F.col(col_a).cast("double"), F.col("ba")),
                _bucket(F.col(col_b).cast("double"), F.col("bb")),
                bits,
            ),
        )
        .drop("ba", "bb")
    )


def zorder_envelope_stats(df_z: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Per-z-prefix min/max envelopes — the footer stats a z-sorted file
    layout would carry. Grouping by the z value itself (each z cell is a
    contiguous run after the sort) shows both dimensions' envelopes are
    tight simultaneously; compare against the global min/max to see the
    skipping ratio."""
    return df_z.groupBy("z").agg(
        F.count("*").alias("n_rows"),
        F.min(col_a).alias("min_a"),
        F.max(col_a).alias("max_a"),
        F.min(col_b).alias("min_b"),
        F.max(col_b).alias("max_b"),
    )
