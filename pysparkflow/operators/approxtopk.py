"""Approximate top-k frequent keys via mergeable Misra-Gries summaries.

The complement to operators/heavyhitters.py: heavy_hitters is EXACT
(sketch candidates + a verification pass over the corpus — two reads);
this is the one-pass bounded-memory sketch for when a second read is
too expensive (a stream, a tape-like source) and a banded estimate is
acceptable. The contract is the classic MG guarantee, kept honest by a
tolerance oracle instead of a hash-match:

    true_count - floor(n / (k_track+1))  <=  est  <=  true_count

Scale shape: one `mapInPandas` pass whose counter dict is bounded by
``k_track`` plus a fixed merge-chunk size regardless of key cardinality
(the whole point — a plain groupBy's hash agg spills on a heavy-tailed
100 TB key space, a sketch never grows; the trim runs inside the batch
merge, not after it, so a high-cardinality Arrow batch cannot balloon
the dict), and it ships at most ``partitions x k_track`` rows into one
tiny final aggregation. Per Arrow batch the counting is C-speed
(`value_counts`); the Python-side merge loop touches DISTINCT keys of
the batch, never rows.

Per-partition summaries merge by summing estimates: a key absent from a
partition's summary contributes 0 there, and MG's decrement accounting
(each decrement of d removes >= (k_track+1)*d mass) bounds the global
undercount by n/(k_track+1) — the "Mergeable Summaries" (Agarwal et
al., PODS'12) argument, which is what makes the map-side sketch safe to
combine in one reduce.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(k_track: int):
    def _trim(counts: dict) -> dict:
        # subtract the (k_track+1)-th largest estimate from every
        # counter and drop the non-positive ones: <= k_track survive,
        # and the removed mass is >= (k_track+1) * d — the decrements
        # across all trims sum to <= n_partition / (k_track + 1)
        if len(counts) <= k_track:
            return counts
        d = sorted(counts.values(), reverse=True)[k_track]
        return {k: v - d for k, v in counts.items() if v > d}

    def fn(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in pdfs:
            vc = pdf["_k"].value_counts()
            # merge in chunks and trim after each so peak memory is
            # O(k_track + chunk), bounded by the SKETCH, not by the
            # Arrow batch's distinct-key count (MG's guarantee is
            # order-insensitive: every trim still removes >=
            # (k_track+1)*d mass, wherever it happens)
            chunk = max(k_track, 1024)
            items = list(vc.items())
            for lo in range(0, len(items), chunk):
                for key, c in items[lo : lo + chunk]:
                    counts[key] = counts.get(key, 0) + int(c)
                counts = _trim(counts)
        if counts:
            yield pd.DataFrame(
                {"_k": list(counts.keys()), "_est": list(counts.values())}
            )

    return fn


def misra_gries_topk(
    df: DataFrame, key_col: str, k_track: int = 64, top_n: int = 5
) -> DataFrame:
    """Top-``top_n`` keys of ``key_col`` (nulls excluded) by Misra-Gries
    estimate. Returns (key_col, count_est) with est in
    [true - n/(k_track+1), true].

    The returned SET of keys equals the exact top-``top_n`` whenever the
    exact counts of ranks ``top_n`` and ``top_n + 1`` are separated by
    more than n/(k_track+1) — size ``k_track`` to the discrimination you
    need, exactly like choosing a sketch width. Ties order by key.

    Keys keep their OWN type (string URLs and tokens are the canonical
    frequent-key workload — a ``cast('long')`` here would throw under
    ANSI mode on the first non-numeric value)."""
    k_type = df.schema[key_col].dataType.simpleString()
    keyed = df.select(F.col(key_col).alias("_k")).where(
        F.col("_k").isNotNull()
    )
    partial = keyed.mapInPandas(
        _mg_partition(k_track), f"_k {k_type}, _est long"
    )
    return (
        partial.groupBy(F.col("_k").alias(key_col))
        .agg(F.sum("_est").cast("long").alias("count_est"))
        .orderBy(F.col("count_est").desc(), F.col(key_col).asc())
        .limit(top_n)
    )
