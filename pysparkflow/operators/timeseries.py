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
    # try_divide: a CONSTANT series (idle sensor) has stddev 0 — its z
    # is null and it correctly flags nothing, where ANSI '/' would kill
    # the job (DuckDB's 0/0 -> NULL agrees); 1-row groups already gave
    # null via stddev_samp = null
    z = F.try_divide(
        F.col(value) - F.avg(value).over(w), F.stddev_samp(value).over(w)
    )
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


def activity_islands(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    min_days: int = 1,
) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per key
    (an "island" ends at the first day with no events). The classic
    sequential-streak primitive (retention streaks, uptime runs,
    consecutive-login badges) — and a shape naive row-loops get wrong at
    scale.

    Dataflow: distinct (key, day) -> one window ``row_number`` per key
    -> island anchor = day - row_number DAYS (constant within a
    consecutive run, strictly decreasing across gaps) -> one group-by.
    Two exchanges total, both on the series key; the window sort is per
    key over its active DAYS (<= horizon, not event rows), so the plan
    survives any event volume — the explode-to-days reduction happens
    in the first aggregate.
    Returns (key, island_start, island_end, n_days) for islands of at
    least ``min_days`` days."""
    days = events.select(
        F.col(key), F.to_date(ts).alias("day")
    ).distinct()
    w = Window.partitionBy(key).orderBy("day")
    anchored = days.select(
        key,
        "day",
        F.date_sub("day", F.row_number().over(w)).alias("anchor"),
    )
    return (
        anchored.groupBy(key, "anchor")
        .agg(
            F.min("day").alias("island_start"),
            F.max("day").alias("island_end"),
            F.count("*").alias("n_days"),
        )
        .where(F.col("n_days") >= min_days)
        .drop("anchor")
    )


def merge_intervals(
    intervals: DataFrame,
    key: str = "user_id",
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Merge overlapping/touching [start, end] intervals per key into
    maximal covered spans — the interval-union sweep (machine busy
    windows, session coverage, on-call coalescing).

    Dataflow: one window per key ordered by (start, end): a new span
    begins where ``start`` exceeds the running max of all PRECEDING
    ends; the span id is the running count of such breaks; then one
    group-by over (key, span). Both exchanges hash on the key; the sort
    is per key over its own intervals. No self-join — the O(n^2)
    formulation pairs every interval with every other per key.
    Returns (key, span_start, span_end, n_intervals)."""
    w = Window.partitionBy(key).orderBy(start, end)
    prev_max_end = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    breaks = intervals.select(
        key,
        start,
        end,
        F.when(
            F.col(start) > prev_max_end, F.lit(1)
        ).otherwise(F.lit(0)).alias("_brk"),
    )
    spans = breaks.select(
        key,
        start,
        end,
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_span"),
    )
    return (
        spans.groupBy(key, "_span")
        .agg(
            F.min(start).alias("span_start"),
            F.max(end).alias("span_end"),
            F.count("*").alias("n_intervals"),
        )
        .drop("_span")
    )
