"""Time-series operators: gap filling, interval-range rolling windows,
and per-group z-score anomaly detection.

The reference's query surface is batch-relational (SURVEY §2.4-§2.6);
these extend it with the hypertable-style operations a metrics/telemetry
pipeline runs over the same event tables:

- ``gap_fill_hourly``: densify a per-key hourly series so downstream
  window math sees every bucket (missing hours as explicit zero rows).
  Spark-first shape: per-key ``sequence()`` + ``explode`` generates the
  calendar arms **distributed** (each key's calendar is built on the
  executor that owns the key — no driver-side date loop), then one
  left join against the observed buckets.
- ``rolling_range_sum``: event-time RANGE window (e.g. "spend in the
  trailing 30 days per customer") via ``Window.rangeBetween`` over epoch
  seconds — the interval-window analogue of §2.4's running totals.
- ``zscore_outliers``: per-group mean/stddev via a window, flag rows
  with |z| above a threshold. One shuffle (the window partition), no
  self-join against a stats table.

Scale: all three are single-exchange plans partitioned by the series
key; gap-filled output is bounded by keys x horizon, not input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_hourly(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Hourly count + sum per key with missing hours filled as zeros.

    Each key's calendar spans its own [min hour, max hour] (a global
    span would explode sparse keys at 100 TB; per-key spans keep output
    proportional to each key's active horizon).
    Returns (key, hour, n_events, sum_value)."""
    hourly = (
        events.select(
            F.col(key),
            F.date_trunc("hour", F.col(ts)).alias("hour"),
            F.col(value),
        )
        .groupBy(key, "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value), 2).alias("sum_value"),
        )
    )
    spans = hourly.groupBy(key).agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    calendar = spans.select(
        key,
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    return calendar.join(hourly, [key, "hour"], "left").select(
        key,
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


def rolling_range_sum(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    days: int = 30,
) -> DataFrame:
    """Trailing ``days``-day sum of ``value`` per key, event-time RANGE
    semantics (all rows within the interval, however many), via
    ``rangeBetween`` over epoch seconds. Adds ``rolling_sum``."""
    # TIMESTAMP_NTZ has no direct long cast; route via timestamp →
    # long (epoch seconds). The NTZ→timestamp step applies the session
    # timezone, which pysparkflow.session pins to UTC — matching the
    # oracle's epoch() (NTZ interpreted as-is)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).cast("timestamp").cast("long"))
        .rangeBetween(-days * 86400, 0)
    )
    return df.withColumn("rolling_sum", F.round(F.sum(value).over(w), 2))


def zscore_outliers(
    df: DataFrame,
    group: str,
    value: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose ``value`` deviates more than ``threshold`` sample
    standard deviations from the group mean. Adds ``z`` (rounded to 2).

    The stats come from an unbounded window over the group partition —
    the same single exchange the flagging scan then reuses (no stats
    subquery + rejoin)."""
    w = Window.partitionBy(group)
    z = (F.col(value) - F.avg(value).over(w)) / F.stddev_samp(value).over(w)
    return (
        df.withColumn("z", z)
        .filter(F.abs(F.col("z")) > threshold)
        .withColumn("z", F.round("z", 2))
    )


def mad_outliers(
    df: DataFrame,
    group: str,
    value: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust outliers via median absolute deviation: flag rows where
    |value - median| > threshold * 1.4826 * MAD (the normal-consistency
    constant). Unlike z-scores (``zscore_outliers``), the estimator
    itself is immune to the outliers it hunts — one extreme value
    inflates a stddev enough to mask itself, but moves a median not
    at all.

    Dataflow: two group-sized exact-median aggregates (Catalyst
    ``median`` is distributed) with broadcast joins back — the corpus
    shuffles only into the two combiner-friendly aggs, never into a
    window sort. Adds ``dev`` (|value-median| / (1.4826*MAD), rounded).
    Groups with MAD = 0 (over half the values identical) flag any
    deviation from the median."""
    med = df.groupBy(group).agg(F.median(value).alias("_med"))
    with_med = df.join(F.broadcast(med), group)
    mad = (
        with_med.groupBy(group)
        .agg(F.median(F.abs(F.col(value) - F.col("_med"))).alias("_mad"))
    )
    scaled = F.lit(1.4826) * F.col("_mad")
    dev = F.abs(F.col(value) - F.col("_med")) / scaled
    return (
        with_med.join(F.broadcast(mad), group)
        .where(
            F.when(F.col("_mad") > 0, dev > threshold)
            .otherwise(F.abs(F.col(value) - F.col("_med")) > 0)
        )
        .withColumn(
            "dev",
            F.when(F.col("_mad") > 0, F.round(dev, 2)).otherwise(F.lit(None)),
        )
        .drop("_med", "_mad")
    )
