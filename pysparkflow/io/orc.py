"""ORC source/sink.

The reference reads its graphs from text formats (DIMACS, adjacency TSV
— io/dimacs.py, io/adjacency.py); parquet is this engine's native
columnar format. ORC is the other columnar format Spark ships a native
vectorized reader for, and real lakes hold plenty of it — supporting it
is a read/write pass-through to Spark's built-in datasource, which keeps
predicate pushdown and column pruning (the ORC reader supports both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def orc_roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as ORC and read it back — the format-fidelity check
    (schema + values survive the columnar encode/decode)."""
    write_orc(df, path)
    return read_orc(df.sparkSession, path)
