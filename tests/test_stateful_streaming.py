"""Stateful streaming: GroupState must carry totals across micro-batches."""

from __future__ import annotations

from pysparkflow.relational.registry import load_events
from pysparkflow.streaming.stateful import run_running_counts_batchlike


def test_state_crosses_microbatches(spark, sf_dir, tmp_path):
    # split events into two parquet files -> two micro-batches
    events = load_events(spark, sf_dir)
    half = events.where("event_id % 2 = 0")
    other = events.where("event_id % 2 = 1")
    d = tmp_path / "events_stream"
    # write raw (ts as timestamp is fine for the stream schema? the stream
    # declares ts long) -> write with ts as micros-long to match
    from pyspark.sql import functions as F

    for i, part in enumerate([half, other]):
        part.withColumn("ts", F.unix_micros("ts") * 1000).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"f{i}"))
    import glob
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(glob.glob(str(d / "f*" / "*.parquet")))):
        shutil.copy(f, flat / f"part-{i}.parquet")

    out = run_running_counts_batchlike(
        spark, str(flat), query_name="t_state_cross"
    ).toPandas()
    # every user appears once per batch containing their events; final
    # total_events per user == full batch count
    totals = out.groupby("user_id")["total_events"].max()
    expected = events.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
    assert totals.sort_index().equals(expected.sort_index().astype(totals.dtype))
    # state crossed batches: at least one user has 2 emission rows with
    # increasing totals
    multi = out.groupby("user_id").size()
    assert (multi >= 2).any()
    per_user = out[out.user_id == multi[multi >= 2].index[0]].sort_values("total_events")
    assert per_user["total_events"].is_monotonic_increasing
