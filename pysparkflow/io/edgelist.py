"""Edge-list readers for columnar/delimited formats — the modern equivalent
of the reference's SequenceFile round input (S4, ff1/FordFulkerson.java:
170-190): parquet is the default at-scale format (columnar, predicate
pushdown, zstd), CSV for interchange."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pysparkflow.graph.graph import FlowGraph


def read_edgelist(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    src_col: str = "src",
    dst_col: str = "dst",
    cap_col: str | None = None,
    max_cap: int = 1,
    seed: int = 42,
    **reader_options,
) -> FlowGraph:
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "csv":
        df = spark.read.csv(path, header=True, **reader_options)
    elif fmt == "json":
        df = spark.read.json(path, **reader_options)
    else:
        raise ValueError(f"unsupported edge-list format: {fmt}")
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if cap_col:
        cols.append(F.col(cap_col).alias("capacity"))
    return FlowGraph.from_edge_pairs(
        spark,
        df.select(*cols),
        cap_col="capacity" if cap_col else None,
        max_cap=max_cap,
        seed=seed,
    )
