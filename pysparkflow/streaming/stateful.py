"""Custom stateful streaming operator via applyInPandasWithState — the
extension point for operators Structured Streaming lacks natively
(per-key running aggregates, custom sessionization, online sketches).

The reference has no streaming surface (SURVEY.md §2.9); this provides the
pattern: per-group Arrow batches in, explicit GroupState carried across
micro-batches, append-mode emission. The smoke harness streams a static
parquet directory with maxFilesPerTrigger=1 so state genuinely crosses
batch boundaries."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pysparkflow.streaming.events import adaptive_events_scan

# _emit builds its row from ONE int64 ndarray, so the grouping key must
# be integral (long); a string/struct key needs the dict-of-lists row
# construction back (ADVICE r8 note — the any-type path was dropped for
# the ~2x row-build speedup, see _emit)
OUTPUT_SCHEMA = "user_id long, batch_events long, total_events long"
STATE_SCHEMA = "total long"


def _make_running_count(state_horizon_ms: int | None):
    """Build the per-group state function. With ``state_horizon_ms`` set,
    each update arms an event-time timeout at (max event ts seen in this
    batch + horizon); when the watermark passes that point without the key
    re-appearing, Spark invokes the function with ``hasTimedOut`` and we
    drop the state — per-key state lives at most one horizon past the
    key's last event, so total state is bounded by the number of keys
    active inside one horizon."""

    def _running_count(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state_horizon_ms is not None and state.hasTimedOut:
            # flush-on-evict: emit the key's final total with the
            # batch_events=-1 marker, then drop the state. Makes eviction
            # observable downstream (and testable); a sink can treat the
            # marker as "session closed".
            (total,) = state.get if state.exists else (0,)
            state.remove()
            yield _emit(key[0], -1, total)
            return
        (total,) = state.get if state.exists else (0,)
        n = 0
        max_ts_ms = None
        for pdf in pdfs:
            n += len(pdf)
            if state_horizon_ms is not None and len(pdf):
                m = pdf["ts"].max()
                ms = int(m.value // 1_000_000)  # pandas Timestamp ns -> ms
                max_ts_ms = ms if max_ts_ms is None else max(max_ts_ms, ms)
        total += n
        state.update((total,))
        if state_horizon_ms is not None and max_ts_ms is not None:
            # must be beyond the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
                max(max_ts_ms, state.getCurrentWatermarkMs() + 1) + state_horizon_ms
            )
        yield _emit(key[0], n, total)

    return _running_count


_EMIT_COLS = ["user_id", "batch_events", "total_events"]


def _emit(user_id: int, batch_events: int, total: int) -> pd.DataFrame:
    """One output row. Built from a single int64 ndarray: this runs once
    per group per micro-batch, and pandas' dict-of-lists constructor is
    ~2x the cost of wrapping a homogeneous 2-D array (all three output
    columns are int64, so one array is exact)."""
    return pd.DataFrame(
        np.array([[user_id, batch_events, total]], dtype=np.int64),
        columns=_EMIT_COLS,
    )


def running_event_counts(
    stream: DataFrame,
    state_horizon: str | None = "30 days",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Per-user running event counts: emits one row per (user, micro-batch)
    with the batch size and the cumulative total carried in GroupState.

    With ``state_horizon`` set (the default), the stream is watermarked and
    each key's state carries an event-time timeout one horizon past its
    last event — idle keys are evicted, bounding the state store on an
    unbounded key space (the 100 TB contract: state ∝ active keys per
    horizon, not all keys ever seen). A key returning after eviction
    restarts its running total — that is the documented horizon semantics.
    ``state_horizon=None`` keeps state forever (``NoTimeout``) — only for a
    known-bounded key space.

    The stream is projected to the two columns the state function reads
    (``user_id``, ``ts``) BEFORE the stateful exchange: every other
    column would be Arrow-serialized into the Python workers and pandas-
    materialized per group for nothing. On the sf0.1 events stream
    (6 columns, two of them strings) this is ~35% of the operator's
    addBatch time (VERDICT r7 #3 measurement); at 100 TB it is the
    difference between shuffling the key+timestamp pair and shuffling
    the full event payload into the state store exchange."""
    horizon_ms = (
        None if state_horizon is None else _duration_to_ms(state_horizon)
    )
    # validate up front (ADVICE r8): a missing key column — or a missing
    # event-time column when the horizon needs one — must fail HERE with
    # the operator's contract, not later inside withWatermark/groupBy
    # with a generic resolution error
    required = ["user_id"] + (["ts"] if state_horizon is not None else [])
    missing = [c for c in required if c not in stream.columns]
    if missing:
        raise ValueError(
            f"running_event_counts requires column(s) {missing} on the "
            f"stream (have {stream.columns}); 'ts' is only required when "
            f"state_horizon is set (got {state_horizon!r})"
        )
    fn = _make_running_count(horizon_ms)
    keep = [c for c in ("user_id", "ts") if c in stream.columns]
    stream = stream.select(*keep)
    if state_horizon is None:
        return stream.groupBy("user_id").applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_to_ms(spec: str) -> int:
    """Parse a '<n> <unit>' duration (the CalendarInterval subset our API
    accepts) to milliseconds."""
    n_s, unit = spec.strip().split()
    n = int(n_s)
    unit = unit.rstrip("s").lower()
    factor = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }
    if unit not in factor:
        raise ValueError(f"unsupported duration unit in {spec!r}")
    return n * factor[unit]


def run_running_counts_batchlike(
    spark: SparkSession,
    events_dir: str,
    query_name: str = "running_counts",
    max_files_per_trigger: int = 1,
    path_glob: str | None = None,
    state_horizon: str | None = "30 days",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Drive the stateful operator over a directory of parquet files, one
    file per micro-batch (state crosses batches), to completion.
    ``path_glob`` restricts which files stream (e.g. a single table file
    inside a multi-table directory). ``state_horizon`` /
    ``watermark_delay`` are passed to :func:`running_event_counts` —
    horizon-bounded state by default."""
    schema, finish = adaptive_events_scan(spark, events_dir, glob_filter=path_glob)
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", str(max_files_per_trigger)
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = finish(reader.format("parquet").load(events_dir))
    out = running_event_counts(
        stream, state_horizon=state_horizon, watermark_delay=watermark_delay
    )
    from ..engine.partitioning import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, events_dir, glob=path_glob)
    ):
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
