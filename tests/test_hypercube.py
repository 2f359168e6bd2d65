"""Analytic-oracle graph tests on the n-dim hypercube (the shape used for
the 1M-vertex evidence in tools/scale_evidence.py, shrunk to Q8 for CI):

* BFS distance from 0 == popcount(v) + 1 for every vertex;
* per-level counts == C(n, d);
* Q_n is n-edge-connected => unit-cap max-flow 0 -> 2^n - 1 == n;
* dropping bit n-1 edges yields exactly two Q_{n-1} components.

These need no external oracle at any size — the same script validates the
Q20 run.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pysparkflow.algo.bfs import bfs_distances
from pysparkflow.algo.components import connected_components
from pysparkflow.algo.maxflow import MaxFlowConfig, max_flow
from pysparkflow.graph.graph import FlowGraph

N_BITS = 8


def _hypercube(spark, n_bits: int, drop_bit: int | None = None) -> FlowGraph:
    masks = [1 << b for b in range(n_bits) if b != drop_bit]
    edges = (
        spark.range(1 << n_bits)
        .select(
            F.col("id").alias("u"),
            F.explode(F.array(*[F.lit(m).cast("long") for m in masks])).alias("m"),
        )
        .where(F.col("u").bitwiseAND(F.col("m")) == 0)
        .select(
            "u",
            F.col("u").bitwiseXOR(F.col("m")).alias("v"),
            F.lit(1).cast("long").alias("cap"),
        )
    )
    return FlowGraph(spark, edges)


def test_bfs_popcount(spark):
    g = _hypercube(spark, N_BITS)
    dist = bfs_distances(g, [0])
    assert (
        dist.where(F.col("distance") != F.bit_count(F.col("vertex")) + 1).count() == 0
    )
    levels = {
        r["distance"]: r["count"] for r in dist.groupBy("distance").count().collect()
    }
    assert levels == {d + 1: math.comb(N_BITS, d) for d in range(N_BITS + 1)}


def test_maxflow_edge_connectivity(spark):
    g = _hypercube(spark, N_BITS)
    res = max_flow(
        g,
        sources=[0],
        sinks=[(1 << N_BITS) - 1],
        config=MaxFlowConfig(excess_list_max=4, validate=True),
    )
    assert res.value == N_BITS


def test_components_two_halves(spark):
    g = _hypercube(spark, N_BITS, drop_bit=N_BITS - 1)
    labels = connected_components(g)
    half = 1 << (N_BITS - 1)
    expected = F.when(F.col("vertex") < half, F.lit(0)).otherwise(F.lit(half))
    assert labels.where(F.col("component") != expected).count() == 0
