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


def test_event_time_timeout_evicts_idle_keys(spark, tmp_path):
    """Event-time state timeout: a key idle for more than the horizon is
    evicted (flush marker batch_events=-1 with its final total), and the
    key re-appearing afterwards restarts its running total — bounded state
    on an unbounded key space."""
    from tests.test_streaming import _write_event_file

    d = str(tmp_path / "evict")
    import os

    os.makedirs(d)
    # horizon 1 day, watermark delay 1 hour; one file per micro-batch
    _write_event_file(
        spark,
        f"{d}/f0.parquet",
        [
            (1, "2024-01-01 00:00:00", 1, "click", 1.0),
            (2, "2024-01-01 01:00:00", 1, "click", 1.0),
        ],
        1_000_000,
    )
    # 40 days later: watermark jumps far past user 1's timeout (Jan 2 01:00)
    _write_event_file(
        spark, f"{d}/f1.parquet", [(3, "2024-02-10 00:00:00", 2, "x", 1.0)], 2_000_000
    )
    # user 1 has no data here -> its expired timeout fires in this batch
    _write_event_file(
        spark, f"{d}/f2.parquet", [(4, "2024-02-10 01:00:00", 3, "x", 1.0)], 3_000_000
    )
    # user 1 returns after eviction -> total restarts at 1
    _write_event_file(
        spark, f"{d}/f3.parquet", [(5, "2024-02-10 02:00:00", 1, "click", 1.0)], 4_000_000
    )

    from pysparkflow.streaming.stateful import run_running_counts_batchlike

    out = run_running_counts_batchlike(
        spark,
        d,
        query_name="t_evict",
        state_horizon="1 day",
        watermark_delay="1 hour",
    ).toPandas()
    u1 = set(
        zip(
            out[out.user_id == 1]["batch_events"].tolist(),
            out[out.user_id == 1]["total_events"].tolist(),
        )
    )
    assert u1 == {(2, 2), (-1, 2), (1, 1)}
    # user 2's state never timed out (its horizon extends past end of input)
    assert (-1 not in out[out.user_id == 2]["batch_events"].tolist())
