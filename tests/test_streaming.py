"""Structured Streaming smoke: the windowed streaming plan over the static
events parquet must equal the batch hourly rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from pysparkflow.relational.registry import load_events
from pysparkflow.streaming.events import run_windowed_counts_batchlike


def test_stream_equals_batch(spark, sf_dir):
    stream_out = run_windowed_counts_batchlike(
        spark, f"{sf_dir}/events.parquet", query_name="t_stream_eq_batch"
    )
    batch = (
        load_events(spark, sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    s = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) > 0
