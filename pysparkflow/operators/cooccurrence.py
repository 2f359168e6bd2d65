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
    from pysparkflow.engine.cache import track

    # r13 opt (guide §2.2/§1.2): ONE shuffle of the bipartite table (the
    # groupBy-basket collect_set, which dedups (b, i) as it aggregates)
    # replaces the old distinct -> width-agg -> semi-join -> self-join
    # chain, which exchanged the (basket, item) table four times. Pair
    # generation becomes MAP-SIDE array combinatorics over each basket's
    # sorted item set — still bounded by basket width, never item
    # popularity, exactly as before (array_sort uses the same type
    # ordering as the old ``x.i < y.i`` join predicate, so pair identity
    # and orientation are unchanged).
    #
    # NULL-key equivalence with the old join form: NULL baskets never
    # produced pairs or degree rows (inner join on b), so they are
    # filtered up front; a NULL ITEM never pairs and its degree row was
    # output-invisible, but it DID count toward the old width filter
    # (distinct kept the (b, NULL) row) — the has-null flag restores
    # that one observable effect.
    grouped = (
        baskets.where(F.col(basket_col).isNotNull())
        .groupBy(F.col(basket_col).alias("b"))
        .agg(
            F.array_sort(
                F.collect_set(F.col(item_col))
            ).alias("s"),
            F.max(F.col(item_col).isNull()).alias("hn"),
        )
        .where(
            F.size("s") + F.when(F.col("hn"), 1).otherwise(0)
            <= F.lit(max_basket)
        )
        .select("s")
    )
    grouped = track(grouped)  # consumed twice: pair gen + degrees
    deg = (
        grouped.select(F.explode("s").alias("i"))
        .groupBy("i")
        .agg(F.count("*").alias("n"))
    )
    pairs = (
        grouped.select(
            F.col("s"), F.posexplode("s").alias("p", "item_a")
        )
        .select(
            "item_a",
            F.explode(
                F.slice("s", F.col("p") + F.lit(2), F.size("s"))
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
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
