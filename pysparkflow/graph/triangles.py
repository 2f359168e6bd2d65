"""Triangle counting via degree-ordered edge orientation (compact-forward).

Extends the engine's graph family (max-flow, BFS, connected components,
kNN graph) with the classic clustering primitive. The reference has no
triangle operator, but its graph-build discipline applies directly: the
edge table is canonicalized once (a < b, self-loops dropped, parallel
edges merged — the same round-0 normalization as D1,
ff1/Vertex.java:47-83) and every downstream step is an equi-join Catalyst
can plan.

Scale shape (the reason for the orientation step): joining the raw
undirected edge list with itself to enumerate wedges generates
sum(deg^2) rows — on power-law graphs that explodes on the head
vertices. Orienting every edge from its lower-(degree, id) endpoint to
its higher one makes the out-degree of every vertex O(sqrt(E)) in the
worst case, so the wedge join is bounded and skew-resistant; this is the
standard compact-forward / degree-ordering algorithm. Both joins are
plain equi-joins (shuffle or broadcast as AQE decides) — no Python in
the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical undirected simple edges: (a < b), self-loops dropped,
    parallel edges merged — the D1 normalization without capacities."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def oriented_edges(canon: DataFrame) -> DataFrame:
    """Orient each canonical edge from its lower-(degree, id) endpoint to
    the higher one. Returns (lo, hi) in that total order."""
    deg = (
        canon.select(F.col("a").alias("v"))
        .unionAll(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    e = canon.join(da, "a").join(db, "b")
    # total order: (deg, id) — ties broken by id, so orientation is acyclic
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Count triangles in the undirected graph given by ``edges``.

    Wedges are enumerated only from the oriented edge list (lo→hi), then
    closed against it: triangle {x,y,z} is counted exactly once, at its
    unique orientation-ordered form. Returns a 1-row DataFrame
    ``(n_triangles BIGINT)``."""
    from pysparkflow.engine.cache import track

    # the oriented list feeds BOTH wedge sides and the closing probe —
    # tracked persist, or the canonicalize+orient subtree (two shuffles)
    # recomputes three times; release is the caller's (release_tracked)
    o = track(oriented_edges(canonical_edges(edges, src, dst)))
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = o.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    wedges = e1.join(e2, "y")
    closing = o.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    tri = wedges.join(closing, ["x", "z"])
    return tri.agg(F.count("*").cast("long").alias("n_triangles"))
