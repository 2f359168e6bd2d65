"""Skew-handling join: salting for hot keys.

AQE's skew-join split handles partition-level skew automatically; salting
is the explicit tool for pathological single-key skew (one key holding a
double-digit percentage of rows). The hot side gets a random salt in
[0, factor); the small side is replicated across all salts — turning one
giant partition into ``factor`` balanced ones at the cost of replicating
the build side ``factor`` times.

Salt is hash-seeded from the row content (deterministic — the ff1
seeding discipline), so retries are safe."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    factor: int = 8,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``on`` with the hot side salted
    ``factor`` ways. Column sets must be disjoint apart from ``on``.

    Only inner/left joins are supported: with right/full semantics, an
    unmatched small-side row survives once per salt replica, multiplying
    it ``factor`` times in the output."""
    if how.replace("_", "").lower() not in {"inner", "left", "leftouter"}:
        raise ValueError(
            f"salted_join supports how='inner' or 'left', got {how!r} "
            "(right/full would replicate unmatched small-side rows per salt)"
        )
    salted_large = large.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns], F.lit(seed)), F.lit(factor)),
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    return salted_large.join(replicated_small, on=[on, "_salt"], how=how).drop("_salt")
