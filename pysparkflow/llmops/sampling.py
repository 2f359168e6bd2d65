"""Deterministic sampling / filtering operators for training-data mixing.

A 100 TB curation pipeline needs reproducible subset selection: the same
inputs + config must select the same rows on any cluster, any partition
layout, any retry — which rules out ``rand()`` and ``df.sample`` (both
partition-layout-dependent). Everything here keys decisions off the
PORTABLE md5 content hash (functions.text.portable_hash32), so:

* selection is a map-only scan-fused filter — no shuffle, no state, and
  Parquet row-group pruning still applies to other predicates;
* the DuckDB oracle reproduces the exact row set (hash-gated
  correctness, not rows-only);
* re-runs and late-arriving partitions select consistently (idempotent
  backfills).

The reference has no sampling surface (SURVEY §2.9); the nearest
relative is its deterministic Random(edge.id) capacity assignment
(ff1/Vertex.java:59-67) — the same determinism discipline applied to
row selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pysparkflow.functions.text import portable_hash32

# hash-bucket granularity: rates are quantized to 1/10000
_BUCKETS = 10_000


def _bucket(id_col: str, seed: int):
    """Stable per-row bucket in [0, _BUCKETS): md5 word of "{id}:{seed}"."""
    return F.pmod(
        portable_hash32(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
        F.lit(_BUCKETS),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row of stratum ``s``
    iff its hash bucket < rates[s] * 10000 (strata absent from ``rates``
    use ``default_rate``). The training-mixture primitive: up/down-weight
    languages or sources with exact, reproducible row selection.

    Scale shape: the rates ship as a CASE literal (one map-only filter);
    no shuffle, no join, no driver state. Rates are quantized to 1/10000."""
    if not rates and not default_rate:
        raise ValueError("all rates are zero — empty sample")
    bucket = _bucket(id_col, seed)
    thr = F.lit(int(default_rate * _BUCKETS))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(int(r * _BUCKETS))).otherwise(thr)
    return df.where(bucket < thr)


def quantile_quality_filter(
    docs: DataFrame,
    metric_col: str = "n_chars",
    group_col: str = "lang",
    q: float = 0.25,
) -> DataFrame:
    """Drop each group's bottom ``q`` quantile by ``metric_col`` (keep
    rows with metric >= the group's exact continuous percentile). The
    per-group threshold table is tiny (one row per language/source) and
    broadcast back — the corpus itself is never shuffled."""
    thr = docs.groupBy(group_col).agg(
        F.percentile(metric_col, F.lit(q)).alias("_thr")
    )
    return (
        docs.join(F.broadcast(thr), group_col)
        .where(F.col(metric_col) >= F.col("_thr"))
        .drop("_thr")
    )
