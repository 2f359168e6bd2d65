"""Streaming MERGE sink (streaming/merge_sink.py): the foreachBatch
upsert/delete maintenance loop, including restart exactly-once."""

from __future__ import annotations

import pytest

from pysparkflow.streaming.merge_sink import run_stream_merge_to_parquet

SCHEMA = "k long, v double, seq long, op string"


def _write_batchfile(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "changelog"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )


def test_stream_merge_upserts_and_deletes(spark, dirs):
    clog, state, ckpt = dirs
    _write_batchfile(
        spark, clog,
        [(1, 10.0, 1, "U"), (2, 20.0, 2, "U"), (3, 30.0, 3, "U")],
    )
    out = run_stream_merge_to_parquet(
        spark, clog, state, ckpt, key_cols=["k"], payload_cols=["v"],
        schema=SCHEMA,
    )
    assert {(r["k"], r["v"]) for r in out.collect()} == {
        (1, 10.0), (2, 20.0), (3, 30.0)
    }
    # second wave: update 1, delete 2, insert 4 — restart the query over
    # the grown directory; the checkpoint skips the already-applied file
    _write_batchfile(
        spark, clog,
        [(1, 11.0, 4, "U"), (2, 0.0, 5, "D"), (4, 40.0, 6, "U")],
    )
    out2 = run_stream_merge_to_parquet(
        spark, clog, state, ckpt, key_cols=["k"], payload_cols=["v"],
        schema=SCHEMA,
    )
    assert {(r["k"], r["v"]) for r in out2.collect()} == {
        (1, 11.0), (3, 30.0), (4, 40.0)
    }


def test_stream_merge_later_seq_wins_within_batch(spark, dirs):
    clog, state, ckpt = dirs
    _write_batchfile(
        spark, clog,
        [(7, 1.0, 1, "U"), (7, 2.0, 3, "U"), (7, 9.0, 2, "U")],
    )
    out = run_stream_merge_to_parquet(
        spark, clog, state, ckpt, key_cols=["k"], payload_cols=["v"],
        schema=SCHEMA,
    )
    assert [(r["k"], r["v"]) for r in out.collect()] == [(7, 2.0)]


def test_stream_merge_recovers_crash_between_swap_renames(spark, dirs):
    """ADVICE r5 (merge_sink.py:66): simulate a crash in the exact swap
    window — state_dir renamed aside to .old, process dies before the
    new state renames in. The restarted run must merge the replayed
    batch against the COMMITTED state from .old, not an empty base, and
    must not destroy the backup before the new state lands."""
    import os

    clog, state, ckpt = dirs
    _write_batchfile(
        spark, clog,
        [(1, 10.0, 1, "U"), (2, 20.0, 2, "U")],
    )
    out = run_stream_merge_to_parquet(
        spark, clog, state, ckpt, key_cols=["k"], payload_cols=["v"],
        schema=SCHEMA,
    )
    assert {(r["k"], r["v"]) for r in out.collect()} == {(1, 10.0), (2, 20.0)}
    # crash window: committed state survives only as the .old backup
    os.rename(state, state + ".old")
    # restart with a NEW batch; checkpoint replays nothing (batch 0 is
    # committed), the new file becomes batch 1
    _write_batchfile(spark, clog, [(3, 30.0, 3, "U")])
    out2 = run_stream_merge_to_parquet(
        spark, clog, state, ckpt, key_cols=["k"], payload_cols=["v"],
        schema=SCHEMA,
    )
    assert {(r["k"], r["v"]) for r in out2.collect()} == {
        (1, 10.0), (2, 20.0), (3, 30.0)
    }
    assert not os.path.isdir(state + ".old")


def test_stream_merge_empty_stream_returns_typed_empty(spark, dirs):
    clog, state, ckpt = dirs
    import os

    os.makedirs(clog, exist_ok=True)
    out = run_stream_merge_to_parquet(
        spark, clog, state, ckpt, key_cols=["k"], payload_cols=["v"],
        schema=SCHEMA,
    )
    assert out.columns == ["k", "v"]
    assert out.count() == 0
