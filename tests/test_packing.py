"""Sequence packing: position invariants, determinism, scale contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkflow.llmops.packing import pack_documents


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_pack_positions_are_contiguous_per_bucket(spark, docs):
    """Reconstructed start offsets (example_id * budget + offset) must
    tile each bucket exactly: sorted starts == running sum of lengths."""
    out = pack_documents(docs, budget=128, n_buckets=4).collect()
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert len(by_bucket) == 4
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r.example_id * 128 + r.offset)
        run = 0
        for r in rows:
            assert r.example_id * 128 + r.offset == run
            run += r.n_tokens


def test_pack_deterministic_under_repartition(spark, docs):
    a = {(r.id, r.bucket, r.example_id, r.offset) for r in pack_documents(docs).collect()}
    b = {
        (r.id, r.bucket, r.example_id, r.offset)
        for r in pack_documents(docs.repartition(13)).collect()
    }
    assert a == b and len(a) == docs.count()


def test_pack_rejects_bad_budget(spark, docs):
    with pytest.raises(ValueError, match="budget"):
        pack_documents(docs, budget=0)


def test_pack_shuffles_by_bucket_not_globally(spark, docs):
    """The only exchange is hash partitioning on the bucket key — a
    range/global sort exchange would mean a total corpus sort at 100 TB."""
    plan = (
        pack_documents(docs, budget=128, n_buckets=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(bucket" in plan
    assert "rangepartitioning" not in plan
