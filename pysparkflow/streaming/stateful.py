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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pysparkflow.streaming.events import EVENTS_SCHEMA

OUTPUT_SCHEMA = "user_id long, batch_events long, total_events long"
STATE_SCHEMA = "total long"


def _running_count(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (total,) = state.get if state.exists else (0,)
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    total += n
    state.update((total,))
    yield pd.DataFrame(
        {"user_id": [key[0]], "batch_events": [n], "total_events": [total]}
    )


def running_event_counts(stream: DataFrame) -> DataFrame:
    """Per-user running event counts: emits one row per (user, micro-batch)
    with the batch size and the cumulative total carried in GroupState."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _running_count,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_running_counts_batchlike(
    spark: SparkSession,
    events_dir: str,
    query_name: str = "running_counts",
    max_files_per_trigger: int = 1,
    path_glob: str | None = None,
) -> DataFrame:
    """Drive the stateful operator over a directory of parquet files, one
    file per micro-batch (state crosses batches), to completion.
    ``path_glob`` restricts which files stream (e.g. a single table file
    inside a multi-table directory)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", str(max_files_per_trigger)
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = (
        reader.format("parquet")
        .load(events_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    out = running_event_counts(stream)
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
