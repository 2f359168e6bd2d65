"""Connected components via iterative minimum-label propagation.

Not present in the reference (SURVEY.md §2.9) but a natural sibling of its
BFS machinery and needed by its own test corpus (the ``disconnected``
fixture expects max-flow 0 across components, FIXTURES.md §4). Uses
large-star/small-star style label propagation: every vertex adopts the
minimum component label in its closed neighborhood until fixpoint.
Convergence is checked with one agg per round, same driver-loop shape as
the reference's D11 (ff1/FordFulkerson.java:240-244).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pysparkflow.graph.graph import FlowGraph


def connected_components(graph: FlowGraph, max_iter: int = 50) -> DataFrame:
    """Returns (vertex BIGINT, component BIGINT) where component is the
    minimum vertex id in the component."""
    arcs = (
        graph.edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(graph.edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .persist()
    )
    labels = (
        arcs.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            arcs.join(labels, arcs.dst == labels.vertex)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.vertex == neighbor_min.src, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    arcs.unpersist()
    return labels
