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
micro-batch is delivered once; the swap renames the CURRENT state aside
before renaming the new state in (never a window with no state on
disk), so a crash at any point leaves either the previous or the new
state present and the restarted query re-applies the same batch
(idempotent — apply_changelog with the same seq keys converges to the
same table).

Scale notes: rewriting the whole state per batch is the portable
lowest-common-denominator (no table format dependency); at 100 TB you'd
partition the state by key range and rewrite only partitions the batch
touches, or target a transactional table format where MERGE is native.
The dataflow — changelog compaction + one full-outer key join per
batch — is identical either way (operators/merge.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


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
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Maintain a keyed parquet table from a changelog file stream
    (rows: key..., payload..., seq, op in {'U','D'}). Processes
    everything currently available, then returns a batch reader over
    the final state (typed-empty if the stream delivered nothing)."""
    from pysparkflow.operators.merge import apply_changelog

    work = state_dir + ".next"
    old = state_dir + ".old"
    # crash recovery FIRST (ADVICE r5): a crash between the two swap
    # renames below leaves only the .old backup; restoring it before the
    # query starts means the replayed batch merges against the committed
    # state instead of an empty base. Doing this only after
    # processAllAvailable() (the r5 bug) hit the exact window it was
    # meant to cover.
    if not os.path.isdir(state_dir) and os.path.isdir(old):
        os.rename(old, state_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # bound each micro-batch (CDC streams deliver in seq order; the
        # caller is responsible for file naming that sorts by seq)
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(changelog_path)
    # the state table's schema comes from the PARSED stream schema (a
    # StructType subset) — never from string-splitting the DDL, which
    # breaks on parametrized types like decimal(10,2)
    want = set(key_cols) | set(payload_cols)
    state_schema = T.StructType([f for f in stream.schema.fields if f.name in want])

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        if os.path.isdir(state_dir):
            base = sp.read.parquet(state_dir)
        elif os.path.isdir(old):
            # belt-and-braces beside the pre-start restore: if the crash
            # window reopens mid-run, the backup is still the base —
            # never an empty table while committed state exists on disk
            base = sp.read.parquet(old)
        else:
            base = sp.createDataFrame([], state_schema)
        merged = apply_changelog(
            base, batch, key_cols=key_cols, payload_cols=payload_cols,
            seq_col=seq_col, op_col=op_col,
        )
        # atomic-enough swap: write new state aside, move the current
        # state OUT OF THE WAY (rename, not delete), move the new state
        # in, then drop the old. A crash at any point leaves a complete
        # state directory on disk (state_dir or state_dir.old) and the
        # checkpoint replays this batch on restart. The .old backup is
        # deleted ONLY after the new state rename has succeeded (ADVICE
        # r5): it is the sole copy of committed state inside the swap
        # window, so it must never be removed ahead of the rename.
        merged.write.mode("overwrite").parquet(work)
        if os.path.isdir(state_dir):
            if os.path.isdir(old):
                # stale backup from an earlier crash whose state_dir
                # survived — state_dir is authoritative, free the slot
                shutil.rmtree(old)
            os.rename(state_dir, old)
        os.rename(work, state_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)

    from ..engine.partitioning import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    # each merge_batch runs a batch dedup+join against the state table;
    # size its shuffle to the changelog volume (the state table is the
    # same order of magnitude), not the session's big-relational tuning
    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, changelog_path)
    ):
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # crash recovery: if only the .old survives (crash between the two
    # renames), restore it as the current state
    if not os.path.isdir(state_dir) and os.path.isdir(old):
        os.rename(old, state_dir)
    if not os.path.isdir(state_dir):
        return spark.createDataFrame([], state_schema)
    return spark.read.parquet(state_dir)
