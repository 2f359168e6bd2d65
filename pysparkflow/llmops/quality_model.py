"""Deterministic quality-classifier scoring — the fasttext-style curation
gate of a pretraining pipeline (score every document, threshold, mix).

Production pipelines gate web text with a tiny supervised classifier
(fasttext / logistic regression over cheap surface features) long before
any expensive model sees the data. This module is that gate with the
model weights as LITERAL constants: a linear score over the
``textstats.quality_features`` surface features, sigmoid-calibrated to
(0, 1). Literal weights make the operator fully oracle-replayable — the
DuckDB oracle recomputes the identical arithmetic — while keeping the
exact production plan shape: the real thing swaps the constants for
learned ones, nothing else changes.

Plan shape (and why it scales to 100 TB): the features are built-in
column arithmetic fused into the scan (codegen, no Python), the score is
one more projected expression, and the keep decision is a map-only
filter — zero shuffles, zero joins, nothing collected. Scoring 100 TB
is embarrassingly parallel; the only data movement is whatever the
DOWNSTREAM consumer (mixture sampling, packing) needs.

Feature transforms are computed on the ROUNDED (4 dp) feature values
exactly as ``quality_features`` emits them, so classifier output is
bit-reproducible from the published feature table — score-from-features
equals score-from-text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pysparkflow.llmops.textstats import quality_features

# Literal model weights (intercept + per-feature). Hand-calibrated on the
# synthetic corpus to spread scores across (0, 1): fluent prose (high
# stopword ratio, moderate token length, low digit/punct load) scores
# high; listy/numeric/fragmented text scores low. Swap for learned
# weights in production — the plan is identical.
QUALITY_WEIGHTS: dict[str, float] = {
    "intercept": -3.58,
    "log_tokens": 1.0,        # ln(1 + n_tokens): length prior
    "avg_token_len": -0.15,   # very long "tokens" = markup/URLs
    "punct_ratio": -4.0,      # punctuation walls
    "digit_ratio": -6.0,      # tables / serial numbers
    "stopword_ratio": 15.0,   # English-fluency proxy
}


def quality_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(id, n_tokens, q_score): sigmoid(w . features) per document,
    rounded to ``round_to`` for cross-engine hash stability."""
    w = QUALITY_WEIGHTS
    feats = quality_features(df, id_col=id_col, text_col=text_col)
    z = (
        F.lit(w["intercept"])
        + F.lit(w["log_tokens"]) * F.log(F.lit(1.0) + F.col("n_tokens"))
        + F.lit(w["avg_token_len"]) * F.col("avg_token_len")
        + F.lit(w["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(w["digit_ratio"]) * F.col("digit_ratio")
        + F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        "id", "n_tokens", F.round(score, round_to).alias("q_score")
    )


def quality_classify(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """(id, n_tokens, q_score, keep): the curation gate — score plus the
    boolean threshold decision. ``keep`` compares the ROUNDED score so
    the decision is replayable from the published score column alone.
    An unscorable document (empty text -> null ratio features -> null
    score) is REJECTED, not null: the gate's contract is a total
    boolean decision over any corpus."""
    return quality_scores(
        df, id_col=id_col, text_col=text_col, round_to=round_to
    ).withColumn(
        "keep",
        F.coalesce(F.col("q_score") >= F.lit(threshold), F.lit(False)),
    )


def rank_fusion(
    df: DataFrame,
    signals: dict[str, Column],
    weights: dict[str, float],
    partition_col: str = "source",
    id_col: str = "doc_id",
    keep_frac: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Multi-signal quality gate by per-partition rank fusion:
    (id, partition, fused, keep) where ``fused`` is the weighted average
    of each signal's percent_rank WITHIN the partition and ``keep`` is
    fused >= 1 - keep_frac (the top ``keep_frac`` of each partition by
    blended rank, up to rank ties at the boundary).

    Rank fusion is how production curation blends incommensurable
    signals (length, lexical diversity, classifier score) across
    heterogeneous sources: raw scores are not comparable between a
    code crawl and a news crawl, but within-source ranks are. Each
    signal is normalized to [0, 1] by percent_rank over (partition,
    signal, id) — id as the deterministic tiebreak — then blended.

    One exchange: every window shares the same partitioning key, so
    Catalyst plans a single hash-partitioned exchange followed by one
    sort per signal. ``keep`` compares the ROUNDED fused score, so the
    decision is replayable from the published column alone.

    NULL signals (e.g. a NULL text row feeding a size()/division
    expression) rank WORST: the window ordering is pinned
    ``asc_nulls_first`` — the same total-decision contract as
    quality_classify's reject-unscorable rule — rather than left to the
    engine default (Spark defaults NULLS FIRST but DuckDB defaults
    NULLS LAST, so an unpinned ordering silently diverges from the
    oracle instead of failing loudly; ADVICE r10). Oracles must spell
    ``ORDER BY sig ASC NULLS FIRST``."""
    if not signals:
        raise ValueError("signals must be non-empty")
    if set(signals) != set(weights):
        raise ValueError(
            f"signals/weights key mismatch: {sorted(signals)} vs "
            f"{sorted(weights)}"
        )
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError(f"weights must sum positive, got {total_w}")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(partition_col).alias("partition"),
        *[expr.alias(f"_s_{name}") for name, expr in signals.items()],
    )
    fused = None
    for name in sorted(signals):
        # asc_nulls_first is Spark's asc default — pinned so the contract
        # (NULL signal ranks worst) survives engines whose default is
        # NULLS LAST (see docstring)
        w = Window.partitionBy("partition").orderBy(
            F.col(f"_s_{name}").asc_nulls_first(), F.col("id").asc()
        )
        term = F.lit(weights[name] / total_w) * F.percent_rank().over(w)
        fused = term if fused is None else fused + term
    out = base.select(
        "id", "partition", F.round(fused, round_to).alias("fused")
    )
    return out.withColumn(
        "keep", F.col("fused") >= F.lit(round(1.0 - keep_frac, round_to))
    )
