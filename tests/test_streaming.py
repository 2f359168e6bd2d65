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


def test_stream_join_equals_batch(spark, sf_dir):
    from pysparkflow.streaming.events import run_stream_join_batchlike

    out = run_stream_join_batchlike(
        spark, f"{sf_dir}/events.parquet", query_name="t_stream_join"
    )
    e = load_events(spark, sf_dir)
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    purch = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.round("value", 2).alias("p_value"),
    )
    batch = clicks.join(
        purch,
        (clicks.user_id == purch.p_user)
        & (purch.p_ts >= clicks.click_ts - F.expr("INTERVAL 30 MINUTES"))
        & (purch.p_ts <= clicks.click_ts),
    ).select("user_id", "click_id", "click_ts", "p_ts", "p_value")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in batch.collect()}


def test_stream_dedup_equals_distinct(spark, sf_dir):
    from pysparkflow.streaming.events import run_stream_dedup_batchlike

    out = run_stream_dedup_batchlike(
        spark, f"{sf_dir}/events.parquet", query_name="t_stream_dedup"
    )
    batch = load_events(spark, sf_dir).select("user_id", "event_type").distinct()
    got = {tuple(r) for r in out.collect()}
    assert got == {tuple(r) for r in batch.collect()} and len(got) > 0
