"""Item co-occurrence similarity (common-neighbor Jaccard on a
bipartite graph).

The "frequently bought together" / link-prediction primitive: two items
are similar when the sets of baskets containing them overlap. This is
the common-neighbors family the reference's graph surface stops short
of (its BFS/flow operators walk edges; this scores vertex PAIRS by
shared neighborhoods).

Scale shape — the part that matters at 100 TB: candidate pairs are
generated per BASKET by a self-join on the basket key, so the quadratic
blow-up is bounded by the largest basket's width, not by item
popularity (TPC-H orders hold <= 7 lineitems; real carts are similarly
small). Hub baskets above ``max_basket`` items are dropped the way
minhash drops nothing but a stop-word-like hub contributes nothing but
noise pairs. The per-item degree table is a separate small aggregate
joined back AFTER pair counting — items never fan out by their own
popularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_similarity(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    max_basket: int = 64,
) -> DataFrame:
    """Jaccard similarity over basket co-membership: for item pairs
    appearing together in >= ``min_count`` baskets,
    J = |baskets with both| / |baskets with either|. Baskets wider than
    ``max_basket`` distinct items are excluded entirely (degenerate
    hubs would contribute width^2 pairs and no signal). Returns
    (item_a, item_b, co_count, jaccard) with item_a < item_b; jaccard
    is a plain int/int division — an exact double across engines."""
    bi = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    ok = (
        bi.groupBy("b")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") <= max_basket)
        .select("b")
    )
    bi = bi.join(ok, "b")
    deg = bi.groupBy("i").agg(F.count("*").alias("n"))
    pairs = (
        bi.alias("x")
        .join(bi.alias("y"), "b")
        .where(F.col("x.i") < F.col("y.i"))
        .groupBy(
            F.col("x.i").alias("item_a"), F.col("y.i").alias("item_b")
        )
        .agg(F.count("*").alias("co_count"))
        .where(F.col("co_count") >= min_count)
    )
    return (
        pairs.join(deg.withColumnsRenamed({"i": "item_a", "n": "n_a"}), "item_a")
        .join(deg.withColumnsRenamed({"i": "item_b", "n": "n_b"}), "item_b")
        .select(
            "item_a",
            "item_b",
            "co_count",
            (
                F.col("co_count")
                / (F.col("n_a") + F.col("n_b") - F.col("co_count"))
            ).alias("jaccard"),
        )
    )
