"""Dataset snapshot diffing: what changed between two corpus versions.

Ingest pipelines re-crawl and re-deliver; before reprocessing 100 TB the
operator of record is "what actually changed": which documents were
added, which disappeared, which have the same id but different content.
Content equality is by md5 digest, so the full-outer comparison joins
32-byte digests keyed by id — text never shuffles, and the join
co-partitions on the id column both sides already carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status) for every id whose membership or content differs
    between ``old`` and ``new``: status in {'added', 'removed',
    'changed'}. Unchanged ids are absent — at snapshot scale the diff is
    normally orders of magnitude smaller than either input."""
    o = old.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("_old_h")
    )
    n = new.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("_new_h")
    )
    joined = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("_old_h").isNull(), F.lit("added"))
        .when(F.col("_new_h").isNull(), F.lit("removed"))
        .when(F.col("_old_h") != F.col("_new_h"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select("id", "status")
    )
