"""Distribution-drift monitoring between dataset snapshots (PSI).

Before swapping a new crawl / new mixture into a training pipeline, the
standard QA gate is: has the feature distribution moved vs the reference
snapshot? The Population Stability Index per group,

    PSI = sum over bins of (p_cur - p_ref) * ln(p_cur / p_ref),

with the conventional read: < 0.1 stable, 0.1-0.25 drifting, > 0.25
shifted.

Plan shape (and why it scales to 100 TB): both snapshots are binned and
counted in ONE pass — a single ``groupBy(group, bin)`` with two
conditional counts (``count_if`` on the snapshot flag), so the corpus
is scanned once and the only shuffle carries |groups| x |bins| partial
rows (combiner-friendly, vocabulary-sized). Per-group totals and the
PSI fold then run on that tiny table. No window over the corpus, no
second scan, no join between snapshots.

Zero-count bins use Laplace smoothing (+0.5 per bin) so the logarithm
is total and the statistic stays deterministic — the same smoothed
formula is replayed verbatim by the DuckDB oracle (hash-match, not
banded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_drift(
    df: DataFrame,
    snapshot_col: Column,
    value_col: str = "value",
    group_col: str = "event_type",
    bin_width: float = 50.0,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """(group, n_ref, n_cur, psi) per group: PSI of ``value_col`` binned
    into ``n_bins`` fixed-width buckets (the last bin catches the
    overflow tail), between the rows where ``snapshot_col`` is false
    (reference) and true (current).

    Fixed-width bins, not quantile bins, keep the statistic exactly
    replayable cross-engine and the plan one-pass; pass a wider
    ``bin_width`` for heavy-tailed features.

    Bin 0 catches the underflow tail (negative values clamp up, ADVICE
    r7) and bin ``n_bins - 1`` the overflow tail, so every row's mass —
    including centered / z-scored features — lands in the scaffold and
    contributes to the PSI sum. Rows with a NULL ``value_col`` are
    excluded BEFORE the totals: a null has no bin, and counting it into
    ref_total/cur_total while its mass never reaches the scaffold would
    deflate every bin's probability and understate drift — the same
    counted-but-unbinned leak the underflow clamp closed for negative
    values."""
    if bin_width <= 0 or n_bins <= 0:
        raise ValueError(
            f"bin_width and n_bins must be positive, got {bin_width}/{n_bins}"
        )
    df = df.where(F.col(value_col).isNotNull())
    b = F.greatest(
        F.lit(0),
        F.least(
            F.floor(F.col(value_col) / F.lit(bin_width)).cast("int"),
            F.lit(n_bins - 1),
        ),
    )
    cur = snapshot_col
    binned = (
        df.select(
            F.col(group_col).alias("grp"),
            b.alias("bin"),
            cur.cast("int").alias("is_cur"),
        )
        .groupBy("grp", "bin")
        .agg(
            F.count_if(F.col("is_cur") == 0).alias("ref_n"),
            F.count_if(F.col("is_cur") == 1).alias("cur_n"),
        )
    )
    totals = binned.groupBy("grp").agg(
        F.sum("ref_n").alias("ref_total"), F.sum("cur_n").alias("cur_total")
    )
    # a bucket EMPTY on one or both sides still contributes a smoothed
    # term (it only cancels when the two totals happen to match), so the
    # sum must run over the complete |groups| x n_bins scaffold — a tiny
    # table built from the totals, never from the corpus
    scaffold = totals.select(
        "grp",
        "ref_total",
        "cur_total",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
    )
    full = scaffold.join(binned, ["grp", "bin"], "left").select(
        "grp",
        "ref_total",
        "cur_total",
        F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
        F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
    )
    smooth_bins = float(n_bins) * 0.5
    p = (F.col("cur_n") + 0.5) / (F.col("cur_total") + F.lit(smooth_bins))
    q = (F.col("ref_n") + 0.5) / (F.col("ref_total") + F.lit(smooth_bins))
    return (
        full.groupBy("grp")
        .agg(
            F.max("ref_total").alias("n_ref"),
            F.max("cur_total").alias("n_cur"),
            F.round(F.sum((p - q) * F.log(p / q)), round_to).alias("psi"),
        )
        .select(F.col("grp").alias(group_col), "n_ref", "n_cur", "psi")
    )
