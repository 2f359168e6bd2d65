"""Streaming MERGE (upsert/delete) sink via foreachBatch.

The missing half of the changelog story: ``operators/merge.py``
applies a changelog to a table in batch; real pipelines receive the
changelog as a STREAM (CDC, kafka) and must maintain the table
continuously. Spark's parquet streaming sink is append-only, so upsert
maintenance is the canonical ``foreachBatch`` pattern:

    each micro-batch of changelog rows
      -> apply_changelog(current_state, batch)     (batch semantics)
      -> atomically replace the state directory

Exactly-once: the streaming checkpoint (WAL + source offsets) ensures a
micro-batch is delivered once; the swap is write-to-temp + rename, so a
crash mid-batch leaves the previous state intact and the restarted query
re-applies the same batch (idempotent — apply_changelog with the same
seq keys converges to the same table).

Scale notes: rewriting the whole state per batch is the portable
lowest-common-denominator (no table format dependency); at 100 TB you'd
partition the state by key range and rewrite only partitions the batch
touches (the ``partition_by`` knob gives the layout), or target a
transactional table format where MERGE is native. The dataflow —
changelog compaction + one full-outer key join per batch — is identical
either way (operators/merge.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from pysparkflow.operators.merge import apply_changelog


def run_stream_merge_to_parquet(
    spark: SparkSession,
    changelog_path: str,
    state_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    payload_cols: list[str],
    schema: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Maintain a keyed parquet table from a changelog file stream
    (rows: key..., payload..., seq, op in {'U','D'}). Processes
    everything currently available, then returns a batch reader over
    the final state."""
    work = state_dir + ".next"

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        if os.path.isdir(state_dir):
            base = sp.read.parquet(state_dir)
        else:
            base = sp.createDataFrame([], ", ".join(
                f"{c} {t}" for c, t in _base_fields(schema, key_cols, payload_cols)
            ))
        merged = apply_changelog(
            base, batch, key_cols=key_cols, payload_cols=payload_cols,
            seq_col=seq_col, op_col=op_col,
        )
        # write-then-swap: a crash before the rename leaves the old
        # state intact; the checkpoint replays this batch on restart
        merged.write.mode("overwrite").parquet(work)
        if os.path.isdir(state_dir):
            shutil.rmtree(state_dir)
        os.rename(work, state_dir)

    stream = spark.readStream.schema(schema).parquet(changelog_path)
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(state_dir)


def _base_fields(schema: str, key_cols: list[str], payload_cols: list[str]):
    """(name, type) pairs of the state table (keys + payloads) drawn
    from the changelog schema string."""
    want = set(key_cols) | set(payload_cols)
    out = []
    for part in schema.split(","):
        name, typ = part.strip().split(None, 1)
        if name in want:
            out.append((name, typ))
    return out
