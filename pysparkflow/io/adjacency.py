"""Facebook-crawl adjacency-list reader (S2/S3).

One line per vertex: ``id \t <ignored> \t n1 \t n2 ...`` (tab-separated,
neighbors from field index 2 on, ff1/InputFacebook.java:22-63). Required
tolerance, per the reference:

* gzip transparent (ff1/InputFacebook.java:32-33 — free with spark.read.text);
* malformed neighbor tokens skipped (per-token try/catch,
  ff5/FordFulkerson.java:91-92 → ``try_cast`` + null filter);
* self-loops dropped (ff1/InputFacebook.java:48);
* lines with more than ``max_fields`` fields rejected outright — the ff5
  degree guard (``ss.length > 5100``, ff5/FordFulkerson.java:90);
* optional legacy id folding: 64-bit ids >= 10^14 fold to ``10^14 - id``
  (negative), ff1/InputFacebook.java:14-20 / ff2/FordFulkerson.java:291-297.
  Off by default — Spark has native 64-bit ids; the fold exists only because
  IntWritable keys were cheaper in 2010 (SURVEY.md §1.2).

The reference's round-0 symmetrization job (S3/D1) is fused in: the output
is the canonical undirected edge table.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pysparkflow.graph.graph import FlowGraph

_FOLD_THRESHOLD = 10**14


def read_adjacency(
    spark: SparkSession,
    path: str,
    max_fields: int = 5100,
    fold_large_ids: bool = False,
    max_cap: int = 1,
    seed: int = 42,
) -> FlowGraph:
    fields = spark.read.text(path).select(F.split(F.col("value"), "\t").alias("t"))
    fields = fields.where((F.size("t") >= 3) & (F.size("t") <= max_fields))
    # NB: ANSI mode (Spark 4 default) makes plain cast() THROW on malformed
    # tokens; try_cast gives the reference's per-token skip semantics
    # (ff5/FordFulkerson.java:91-92).

    def _fold(col):
        if not fold_large_ids:
            return col
        return F.when(col >= _FOLD_THRESHOLD, F.lit(_FOLD_THRESHOLD) - col).otherwise(col)

    pairs = (
        fields.select(
            F.col("t")[0].try_cast("long").alias("src"),
            F.explode(F.slice(F.col("t"), 3, 1_000_000)).alias("tok"),
        )
        .select("src", F.col("tok").try_cast("long").alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .select(_fold(F.col("src")).alias("src"), _fold(F.col("dst")).alias("dst"))
    )
    return FlowGraph.from_edge_pairs(spark, pairs, max_cap=max_cap, seed=seed)
