"""MERGE-style changelog application (upsert/delete) as plain DataFrame
algebra — the warehouse operation that materializes a new table state
from a base snapshot plus a stream of keyed changes, without a
transactional table format.

Pipeline shape:
1. compact the changelog to the LAST operation per key (row_number over
   a total (seq) order — the same one-key-shuffle compaction as
   ``latest_per_key``);
2. full-outer join base against the compacted changes on the key:
   - key only in base           -> keep the base row
   - last change is an upsert   -> take the change's payload
   - last change is a delete    -> drop the key

Scale shape: one shuffle of the changelog (usually tiny next to base)
for the compaction, one key-partitioned join against base. At 100 TB
the base side is the bulk — it moves through ONE equi-join and is never
re-aggregated; with base bucketed/partitioned on the key even that
shuffle disappears. This is exactly what table formats run under MERGE
INTO; expressed openly it is also the replayable oracle form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

UPSERT = "U"
DELETE = "D"


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """New table state from ``base`` plus ``changes``.

    ``changes`` carries the key columns, payload columns, a total-order
    ``seq_col`` (later wins; must be unique per key for determinism) and
    ``op_col`` in {"U", "D"}. ``base`` carries key + payload columns.
    Returns the merged state with base's column set.

    The op domain is ENFORCED in-dataflow: any op outside {"U", "D"}
    (including NULL) raises at execution instead of being silently
    treated as a delete (ADVICE r4) — a per-row JVM-side conditional,
    no extra validation job."""
    op_checked = F.when(
        F.col(op_col).isin(UPSERT, DELETE), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("apply_changelog: op must be 'U' or 'D', got: "),
                F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    last = (
        # checked on EVERY changelog row (same scan stage, no extra job),
        # not just the applied last-per-key row
        changes.withColumn(op_col, op_checked)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            *key_cols,
            F.col(op_col).alias("_op"),
            *[F.col(c).alias(f"_new_{c}") for c in payload_cols],
        )
    )
    joined = base.join(last, key_cols, "full_outer")
    merged = joined.where(
        F.col("_op").isNull() | (F.col("_op") == UPSERT)
    ).select(
        *key_cols,
        *[
            F.when(F.col("_op") == UPSERT, F.col(f"_new_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload_cols
        ],
    )
    return merged
