"""Dense-vector column expressions over ``array<float|double>`` columns.

Built on zip_with/aggregate (JVM-side, codegen) — no UDF, no Python round
trip. At 100 TB these run inside whole-stage codegen next to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns, accumulated as double."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine of the angle between two vectors, TOTAL over zero vectors:
    a zero-norm side (failed embedder, padding row) has no direction, so
    the similarity is defined as 0.0 — below every positive threshold
    and ranked last in any top-k — instead of an ANSI divide-by-zero
    that kills the job (same zero convention as the numpy block paths
    in llmops/similarity.py). try_divide + coalesce, NOT a norm-product
    clamp (ADVICE r9): greatest(prod, 1e-300) was exact for true zero
    vectors but silently scaled the quotient for subnormal-magnitude
    embeddings whose norm product underflows past 1e-300 while staying
    nonzero (each norm ~1e-160: measured 1e-320/1e-320 -> 1e-20 clamped
    vs the true cosine 1.0). try_divide yields NULL only when the
    product is exactly 0 — i.e. a genuinely direction-free side — and
    coalesce maps that one case to 0.0; every nonzero product, however
    tiny, keeps its IEEE-exact quotient."""
    return F.coalesce(
        F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b)), F.lit(0.0)
    )
