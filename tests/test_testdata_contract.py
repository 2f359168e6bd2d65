"""Schema contract against the REAL shipped testdata.

Round-3 lesson: the driver regenerated /root/testdata between rounds and
changed events.ts from parquet TIMESTAMP(NANOS) to timestamp[us]; the
loader hard-assumed the old encoding and 8 graded queries went red while
the unit suite (which synthesizes its own fixtures) stayed green. This
module pins the contract the engine actually depends on, per sf dir, so
schema drift in the shipped data fails loudly in pytest — the same
tolerance lesson as the reference's malformed-input skip
(ff5/FordFulkerson.java:91-92), applied to the scan layer.
"""

from __future__ import annotations

import os

import pytest

from pysparkflow.relational.registry import TABLES, events_ts_encoding, load_table

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01") if os.path.isdir(d)
]

# dtype contract the engine's operators assume (column -> Spark typeName).
# Only columns the code branches on are pinned — extra columns may appear.
EXPECTED = {
    "lineitem": {"l_partkey": "long", "l_suppkey": "long", "l_quantity": "double"},
    "orders": {"o_orderkey": "long", "o_custkey": "long"},
    "customer": {"c_custkey": "long", "c_nationkey": "integer"},
    "supplier": {"s_suppkey": "long", "s_nationkey": "integer"},
    "part": {"p_partkey": "long"},
    "nation": {"n_nationkey": "integer", "n_regionkey": "integer"},
    "region": {"r_regionkey": "integer"},
    "events": {
        "event_id": "long",
        "ts": "timestamp",  # post-load contract: session-tz TIMESTAMP
        "user_id": "long",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {"doc_id": "long", "text": "string"},
    "embeddings": {"vec_id": "long", "embedding": "array", "label": "integer"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", TABLES)
def test_loaded_dtypes_match_contract(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    got = {f.name: f.dataType.typeName() for f in df.schema.fields}
    for col, want in EXPECTED[table].items():
        assert col in got, f"{sf_dir}/{table}: missing column {col!r} (have {sorted(got)})"
        assert got[col] == want, f"{sf_dir}/{table}.{col}: {got[col]!r} != {want!r}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_encoding_recognized(sf_dir):
    # whatever the generator ships, the probe must classify it — an
    # unrecognized encoding raises here instead of erroring 6 queries
    enc = events_ts_encoding(f"{sf_dir}/events.parquet")
    assert enc in ("nanos", "timestamp")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_values_sane(spark, sf_dir):
    """Guard against the r3 silent failure mode: micros read as nanos
    compresses a month of events into minutes. The loaded span must be
    days-scale, not minutes-scale."""
    import pyspark.sql.functions as F

    e = load_table(spark, sf_dir, "events")
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    span_days = (hi - lo).total_seconds() / 86400
    assert span_days > 1, f"{sf_dir}: events span {span_days:.4f} days — ts misdecoded?"
    assert lo.year >= 2000, f"{sf_dir}: min ts {lo} near epoch — ts misdecoded?"
