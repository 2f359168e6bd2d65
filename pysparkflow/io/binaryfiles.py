"""Binary-file ingest: the entry point of a multimodal pipeline.

``spark.read.format("binaryFile")`` is Spark's built-in datasource for
opaque media: each file becomes one row (path, modificationTime, length,
content BINARY). This module wraps it with the conventions the rest of
the multimodal family (llmops/multimodal.py) expects — a stable doc id
derived from the file name, typed metadata columns, and a partition-size
knob, since media rows are orders of magnitude wider than text rows and
the default 128 MB scan split would put thousands of images in one task.

Scale notes:
- ``pathGlobFilter`` pushes the extension filter into file listing (no
  content is read for excluded files).
- the datasource parallelizes over FILES; a directory of millions of
  small media files scans fine, but tiny-file overhead at the metastore
  level is the real 100 TB concern — upstream compaction into parquet
  with a binary column (io/writers.py) is the steady-state layout, and
  ``binary_files_to_table`` is exactly that conversion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Raw binaryFile scan: (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def binary_files_to_table(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    coalesce_to: int | None = None,
) -> DataFrame:
    """Media files as an analyzable table:
    (file_name, media_id, n_bytes, content).

    ``media_id`` = the digits in the file name (the pipeline convention
    used by the synthetic corpus: ``img_00042.ppm`` -> 42), NULL when the
    name carries none — joinable against document/metadata tables.

    Partitioning: the binaryFile source already splits by
    ``spark.sql.files.maxPartitionBytes`` — tune THAT for task sizing.
    ``coalesce_to`` optionally merges partitions without a shuffle
    (an earlier version ran a count job + a full ``repartition`` here,
    which round-robin-shuffled every payload's bytes — the widest data
    in the pipeline — just to set a partition count)."""
    raw = read_binary_files(spark, path, glob)
    if coalesce_to is not None:
        raw = raw.coalesce(coalesce_to)
    return (
        raw
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
            F.regexp_replace(
                F.element_at(F.split(F.col("path"), "/"), -1), "[^0-9]+", ""
            )
            .try_cast("long")
            .alias("media_id"),
            F.col("length").alias("n_bytes"),
            F.col("content"),
        )
    )
