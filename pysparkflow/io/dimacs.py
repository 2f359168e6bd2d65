"""DIMACS max-flow reader (S1, ff1/InputDimacs.java:13-84).

Format: ``c <comment>``, ``p max <N> <M>``, ``n <id> s|t`` (source/sink
designations), ``a <u> <v> <cap>`` (directed arcs). The reference sums
parallel arcs and symmetrizes opposite arcs into one undirected edge whose
shared capacity is ``cab + cba`` (ff1/InputDimacs.java:51-62); our canonical
undirected edge table gives the same flow semantics: cap(u,v) = sum of all
arcs between u and v in either direction.

Distributed parse: ``spark.read.text`` + split/filter — the line-type
dispatch the reference does in a single-process loop becomes a columnar
filter that Catalyst pushes into the scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pysparkflow.graph.graph import FlowGraph


@dataclass
class DimacsGraph:
    graph: FlowGraph
    sources: list[int]
    sinks: list[int]
    n: int
    m: int


def read_dimacs(spark: SparkSession, path: str) -> DimacsGraph:
    lines = spark.read.text(path).select(
        F.split(F.trim(F.col("value")), r"\s+").alias("t")
    )
    lines = lines.where(F.size("t") > 0).persist()

    arcs = (
        lines.where(F.col("t")[0] == "a")
        .select(
            # try_cast: malformed lines skip, not throw (ANSI-safe)
            F.col("t")[1].try_cast("long").alias("src"),
            F.col("t")[2].try_cast("long").alias("dst"),
            F.col("t")[3].try_cast("long").alias("capacity"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    graph = FlowGraph.from_edge_pairs(spark, arcs, cap_col="capacity")

    node_rows = (
        lines.where(F.col("t")[0] == "n")
        .select(F.col("t")[1].try_cast("long").alias("id"), F.col("t")[2].alias("kind"))
        .collect()
    )
    sources = [int(r["id"]) for r in node_rows if r["kind"] == "s"]
    sinks = [int(r["id"]) for r in node_rows if r["kind"] == "t"]

    p_rows = (
        lines.where((F.col("t")[0] == "p") & (F.col("t")[1] == "max"))
        .select(F.col("t")[2].try_cast("long").alias("n"), F.col("t")[3].try_cast("long").alias("m"))
        .collect()
    )
    n = int(p_rows[0]["n"]) if p_rows else 0
    m = int(p_rows[0]["m"]) if p_rows else 0
    lines.unpersist()
    return DimacsGraph(graph=graph, sources=sources, sinks=sinks, n=n, m=m)
