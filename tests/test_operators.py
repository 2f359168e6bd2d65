"""As-of join and range join semantics on hand-computable data."""

from __future__ import annotations

import datetime as dt

from pysparkflow.operators.asof import asof_join
from pysparkflow.operators.rangejoin import range_join


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 10, m, s)


def test_asof_backward_with_ties_and_missing(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(5), "c")],
        "k long, lts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 200.0), (2, _ts(9), 300.0)],
        "k long, rts timestamp, val double",
    )
    out = {
        r["tag"]: (r["rts_right"], r["val_right"])
        for r in asof_join(left, right, "k", "lts", "rts").collect()
    }
    assert out["a"] == (_ts(10), 100.0)  # tie at equal ts matches (backward)
    assert out["b"] == (_ts(15), 200.0)  # latest prior
    assert out["c"] == (None, None)  # no right row at-or-before


def test_asof_does_not_leak_across_keys(spark):
    left = spark.createDataFrame([(1, _ts(30), "x")], "k long, lts timestamp, tag string")
    right = spark.createDataFrame([(2, _ts(10), 9.0)], "k long, rts timestamp, val double")
    row = asof_join(left, right, "k", "lts", "rts").collect()[0]
    assert row["val_right"] is None


def test_range_join_window_edges(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "err")], "k long, lts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts(9, 59)),   # 1s before  -> in  [lts-60s, lts)
            (1, _ts(9, 0)),    # exactly lts-60s -> in (inclusive lower)
            (1, _ts(10, 0)),   # equal to lts -> excluded (half-open)
            (1, _ts(8, 59)),   # 61s before -> out
            (2, _ts(9, 30)),   # other key -> out
        ],
        "k long, rts timestamp",
    )
    got = sorted(
        r["rts"] for r in range_join(left, right, "k", "lts", "rts", 60).collect()
    )
    assert got == [_ts(9, 0), _ts(9, 59)]
