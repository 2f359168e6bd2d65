"""Round-8 regression tests for the ADVICE r7 edge-case fixes.

Each test pins a behavior that previously crashed or silently dropped
probability mass: negative values in psi_drift, over-unity support and
null keys in heavy_hitters, an empty corpus in bm25_scores, and null
ids crossing dedup_resolution's driver/distributed gate.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pysparkflow.llmops.dedup import dedup_resolution
from pysparkflow.llmops.drift import psi_drift
from pysparkflow.llmops.tfidf import bm25_scores
from pysparkflow.operators.heavyhitters import heavy_hitters


# ---------------------------------------------------------------- psi_drift


def test_psi_drift_negative_values_clamp_to_bin_zero(spark):
    """Negative values (centered / z-scored features) land in bin 0, so
    their probability mass reaches the PSI sum — previously they were
    counted in the totals but excluded from the 0..n_bins-1 scaffold,
    understating drift."""
    rows = [("g", -5.0, 0) for _ in range(10)] + [("g", 120.0, 1) for _ in range(10)]
    df = spark.createDataFrame(rows, "event_type string, value double, snap int")
    out = psi_drift(df, snapshot_col=F.col("snap") == 1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_ref, r.n_cur) == (10, 10)
    # hand-rolled smoothed PSI: ref mass all in bin 0, cur all in bin 2
    def p(n, total, bins=10):
        return (n + 0.5) / (total + bins * 0.5)

    expect = 0.0
    for b in range(10):
        pc = p(10 if b == 2 else 0, 10)
        pr = p(10 if b == 0 else 0, 10)
        expect += (pc - pr) * math.log(pc / pr)
    assert abs(r.psi - round(expect, 6)) < 1e-9
    # a pure mirror shift must be strongly "shifted", not near-zero
    assert r.psi > 0.25


def test_psi_drift_all_negative_identical_snapshots_near_zero(spark):
    rows = [("g", -42.0, s) for s in (0, 1) for _ in range(50)]
    df = spark.createDataFrame(rows, "event_type string, value double, snap int")
    r = psi_drift(df, snapshot_col=F.col("snap") == 1).collect()[0]
    assert (r.n_ref, r.n_cur) == (50, 50)
    assert abs(r.psi) < 1e-9


# ------------------------------------------------------------ heavy_hitters


def test_heavy_hitters_min_count_above_n_returns_empty(spark):
    """support > 1.0 used to crash freqItems; the exact plan correctly
    yields no rows."""
    df = spark.createDataFrame([(i % 5,) for i in range(100)], "k long")
    assert heavy_hitters(df, "k", min_count=101).count() == 0
    assert heavy_hitters(df, "k", min_count=101, total_rows=100).count() == 0


def test_heavy_hitters_null_keys_consistent_across_gate(spark):
    """Null keys are excluded on BOTH the pruned and the sub-floor exact
    path — previously the left_semi join silently dropped a null-key
    group only on the pruned path."""
    rows = [(None,)] * 60 + [(1,)] * 50 + [(k,) for k in range(2, 42)]
    df = spark.createDataFrame(rows, "k long")
    # pruned path (support comfortably above the freqItems floor)
    pruned = sorted(map(tuple, heavy_hitters(df, "k", min_count=40).collect()))
    # exact path (force the fallback by lying that n is huge)
    exact = sorted(
        map(tuple, heavy_hitters(df, "k", min_count=40, total_rows=10**7).collect())
    )
    assert pruned == exact == [(1, 50)]


# ------------------------------------------------------------------- bm25


def test_bm25_empty_corpus_returns_empty_contract_schema(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    out = bm25_scores(docs, ["spark"])
    assert out.columns == ["doc_id", "score", "rank"]
    assert out.count() == 0


def test_bm25_all_null_text_returns_empty(spark):
    docs = spark.createDataFrame([(1, None), (2, None)], "doc_id long, text string")
    out = bm25_scores(docs, ["spark"])
    assert out.count() == 0


# -------------------------------------------------------- dedup_resolution


def test_dedup_resolution_null_ids_agree_across_gate(spark):
    """Pairs containing a null endpoint are dropped identically on the
    driver union-find path and the distributed label-propagation path —
    previously the driver path raised TypeError ordering None vs int."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (None, 4), (5, None), (7, 8)],
        "id_a long, id_b long",
    )
    driver = sorted(
        map(tuple, dedup_resolution(pairs, n_pairs=5).collect())
    )
    distributed = sorted(map(tuple, dedup_resolution(pairs).collect()))
    assert driver == distributed
    got = dict(driver)
    assert got[1] == got[2] == got[3] == 1
    assert got[7] == got[8] == 7
    assert 4 not in got and 5 not in got and None not in got
