"""Round-8 operators: bloom-prefiltered join, mutual information,
quality-aware cluster representative selection."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pysparkflow.llmops.dedup import select_cluster_representatives
from pysparkflow.operators.bloomjoin import bloom_prefiltered_join
from pysparkflow.operators.infotheory import mutual_information


def test_bloom_join_matches_plain_join(spark):
    """The bloom gate is a superset filter: results must be byte-
    identical to the plain inner join, including fact keys absent from
    the dim (dropped) and dim keys absent from the fact (no effect)."""
    fact = spark.createDataFrame(
        [(i, i % 100) for i in range(5000)], "row_id long, k long"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 100, 7)], "dk long, label string"
    )
    got = (
        bloom_prefiltered_join(fact, dim, "k", "dk")
        .select("row_id", "k", "label")
        .orderBy("row_id")
        .collect()
    )
    want = (
        fact.join(dim, fact.k == dim.dk)
        .select("row_id", "k", "label")
        .orderBy("row_id")
        .collect()
    )
    assert got == want
    assert len(got) == 5000 // 100 * len(range(0, 100, 7))


def test_bloom_join_prefilter_drops_noncandidates(spark):
    """With a selective dim, the row count surviving the bloom gate
    (before the exact join) must be far below the fact count — the
    whole point is that non-candidates never reach the join exchange.
    FPR with 10 bits/key and k=2 is ~3%, so bound at 10%."""
    fact = spark.createDataFrame(
        [(i, i) for i in range(20000)], "row_id long, k long"
    )
    dim = spark.createDataFrame([(7,), (42,)], "dk long")
    joined = bloom_prefiltered_join(fact, dim, "k", "dk")
    assert joined.count() == 2
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_mutual_information_independent_is_zero(spark):
    """A perfectly balanced product distribution has MI exactly 0 in
    every contribution (each cell's log term is ln(1))."""
    rows = [(f"t{i % 3}", i % 4) for i in range(1200)]
    df = spark.createDataFrame(rows, "x string, y int")
    out = mutual_information(df, "x", "y").collect()
    assert len(out) == 3
    assert all(r.mi_contrib == 0.0 for r in out)
    assert all(r.n_x == 400 for r in out)


def test_mutual_information_deterministic_function(spark):
    """y = f(x) gives each x's contribution p_x * ln(1/p_x); the total
    is H(X) (= MI upper bound, fully dependent columns)."""
    rows = [("a", 1)] * 50 + [("b", 2)] * 25 + [("c", 3)] * 25
    df = spark.createDataFrame(rows, "x string, y int")
    out = {r.x: r.mi_contrib for r in mutual_information(df, "x", "y").collect()}
    assert out["a"] == round(0.5 * math.log(1 / 0.5), 6)
    assert out["b"] == round(0.25 * math.log(1 / 0.25), 6)
    assert out["c"] == round(0.25 * math.log(1 / 0.25), 6)


def test_select_cluster_representatives_prefers_score_then_id(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, keep_id long",
    )
    scored = spark.createDataFrame(
        # cluster 1: doc 2 has the top score; cluster 10: tie -> min id
        [(1, 0.2), (2, 0.9), (3, 0.5), (10, 0.7), (11, 0.7)],
        "id long, q_score double",
    )
    out = {
        r.doc_id: (r.best_id, r.score, r.best_score)
        for r in select_cluster_representatives(clusters, scored).collect()
    }
    assert out[1] == (2, 0.2, 0.9)
    assert out[2] == (2, 0.9, 0.9)
    assert out[3] == (2, 0.5, 0.9)
    assert out[10] == (10, 0.7, 0.7)
    assert out[11] == (10, 0.7, 0.7)
