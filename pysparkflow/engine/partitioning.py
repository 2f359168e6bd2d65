"""Data-sized partition counts for iterative dataflows.

The iterative graph family (pagerank, PPR, label propagation, bounded
SSSP) re-scans a static cached arc table every round. The arc table's
partition count sets the MAP-side task count of every round's stages,
and the session ``spark.sql.shuffle.partitions`` is tuned for the
session's big relational shuffles — at local sf0.1 that is 32 partitions
of ~40k arcs each, where per-task scheduling overhead dominates the
10-round loop (measured 2x: 10 rounds over 1.18M arcs run ~7-9s at 32
partitions, ~3.4-5s at 8). AQE's reduce-side coalescing cannot fix this:
it never touches the map-side task count of a cached table's scan.

``sized_partitions`` clamps rows/``rows_per_partition`` to
[1, session shuffle partitions]: small inputs get few, fat partitions
(the scheduling floor shrinks), and at cluster scale the count never
EXCEEDS the cluster-tuned session value — a 1000-executor job with
billions of arcs keeps its configured parallelism. The one count job it
costs is amortized over every round of the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ROWS_PER_PARTITION = 150_000


def sized_partitions(
    n_rows: int, df: DataFrame, rows_per_partition: int = ROWS_PER_PARTITION
) -> int:
    """Partition count for an ``n_rows``-row table scanned every round:
    ~``rows_per_partition`` rows each, at least 1, never more than the
    session's ``spark.sql.shuffle.partitions`` (the cluster-tuned cap)."""
    sess = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(sess, n_rows // rows_per_partition + 1))


def sized_cache(
    df: DataFrame,
    *key_cols: str,
    rows_per_partition: int = ROWS_PER_PARTITION,
) -> tuple[DataFrame, int]:
    """(cached right-sized copy, row count) of ``df`` without computing
    its plan twice: cache the raw plan, count it (one compute), build
    the repartitioned copy FROM the cache, materialize it, release the
    raw cache. The naive count-then-repartition-then-persist order
    recomputes the source plan (often a distinct/symmetrize shuffle)
    once per step. The caller owns the returned cache's release."""
    base = df.persist()
    n = base.count()
    out = (
        base.repartition(sized_partitions(n, df, rows_per_partition), *key_cols)
        if key_cols
        else base.repartition(sized_partitions(n, df, rows_per_partition))
    )
    out = out.persist()
    out.count()  # materialize from the cached base (cheap columnar read)
    base.unpersist()
    return out, n
