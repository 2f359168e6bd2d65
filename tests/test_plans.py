"""Physical-plan lint over the registry — the `.explain("formatted")`
audit, mechanized: a query that silently degrades to a Cartesian product
or an unpruned scan would pass value checks at test scale and explode at
100 TB, so the *plan shape* is asserted here.

Skipped entries: iterative algorithms and streaming harnesses execute on
call (their scale behavior is covered by SCALING.md measurements and the
hypercube tests), not a single inspectable plan.
"""

from __future__ import annotations

import pytest

from pysparkflow.relational.registry import QUERIES

# these run driver loops / streaming queries when called — no single plan
_EXECUTING = {
    "max_flow",
    "max_flow_approx",
    "bfs_distances",
    "connected_components",
    "min_cut",            # runs max-flow + residual BFS loop
    "dedup_resolution",   # label-propagation iteration
    "pagerank",           # driver iteration loop + localCheckpoint
    "kcore",              # peeling loop with per-round counts
    "events_stream_topk", # runs the streaming sink before ranking
    "events_stream_join_outer",
    "events_stream_windowed",
    "events_stream_sessions",
    "events_stream_join",
    "events_stream_enrich",
    "events_stream_dedup",
    "events_stream_stateful",
}

# broadcast-side cross join is the intended plan: tiny query set
# replicated against the corpus (documented in llmops/similarity.py);
# knn_ivf_recall embeds knn_bruteforce as its ground truth;
# funnel_conversion combines three 1-row stage counts (scalar × scalar);
# histogram_bins broadcasts a 1-row min/max scalar against the scan;
# zorder_layout broadcasts a 1-row percentile-boundary scalar likewise;
# approx_distinct combines two 1-row per-column distinct aggs
# (scalar × scalar — split to avoid Expand row multiplication)
_CROSS_JOIN_OK = {
    "knn_bruteforce",
    "knn_ivf_recall",
    "funnel_conversion",
    "histogram_bins",
    "zorder_layout",
    "approx_distinct",
    # 1-row per-dimension stats broadcast (llmops/quantize.py) — the
    # nested-loop join is against a single broadcast row, by design
    "embedding_quantize",
}

_DECLARATIVE = sorted(set(QUERIES) - _EXECUTING)


def _plan(spark, name, sf_dir) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize("name", _DECLARATIVE)
def test_no_cartesian_or_nested_loop(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    if name not in _CROSS_JOIN_OK:
        assert "CartesianProduct" not in plan, f"{name} degraded to a cross join"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} degraded to a nested-loop join"
        )
    # Python in the hot path must be Arrow-batched (MapInPandas /
    # ArrowEvalPython) — row-at-a-time BatchEvalPython is the 10-100x
    # slow path and never acceptable in a graded plan
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"


def test_scan_column_pruning(spark, sf_dir):
    # projections must reach the parquet scan: a 3-column query reading
    # the full orders schema would move ~3x the bytes at scale
    plan = _plan(spark, "sort_limit", sf_dir)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "o_orderkey" in read[0]
    assert "o_comment" not in read[0], "sort_limit scans unused columns"


def test_filter_pushdown(spark, sf_dir):
    plan = _plan(spark, "hash_sample", sf_dir)
    assert "PushedFilters" in plan


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, "broadcast_join", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2
