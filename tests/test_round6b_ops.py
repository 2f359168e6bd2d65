"""Round-6b units: gaps-and-islands, interval union, graded
contamination, co-occurrence Jaccard, nucleus selection, hash split.
Hand-computed on tiny constructed tables; the sf0.01 oracle entries
cover corpus shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(day: int, hour: int = 0, minute: int = 0):
    return dt.datetime(2024, 3, day, hour, minute)


def test_activity_islands_streaks(spark):
    from pysparkflow.operators.timeseries import activity_islands

    rows = [
        # user 1: days 1-3 consecutive, then day 6 alone, then 8-9
        (1, _ts(1)), (1, _ts(1, 12)), (1, _ts(2)), (1, _ts(3)),
        (1, _ts(6)), (1, _ts(8)), (1, _ts(9)),
        # user 2: one long streak 1-5
        (2, _ts(1)), (2, _ts(2)), (2, _ts(3)), (2, _ts(4)), (2, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["user_id"], str(r["island_start"]), str(r["island_end"])): r["n_days"]
        for r in activity_islands(df, min_days=1).collect()
    }
    assert got == {
        (1, "2024-03-01", "2024-03-03"): 3,
        (1, "2024-03-06", "2024-03-06"): 1,
        (1, "2024-03-08", "2024-03-09"): 2,
        (2, "2024-03-01", "2024-03-05"): 5,
    }
    # min_days filter drops the singleton island
    n = activity_islands(df, min_days=2).count()
    assert n == 3


def test_merge_intervals_sweep(spark):
    from pysparkflow.operators.timeseries import merge_intervals

    rows = [
        # overlapping pair -> one span; a CONTAINED interval must not
        # split the span (the running-max-of-ends guard, where a naive
        # lag(end) formulation breaks)
        (1, _ts(1, 10, 0), _ts(1, 11, 0)),
        (1, _ts(1, 10, 30), _ts(1, 10, 40)),
        (1, _ts(1, 10, 50), _ts(1, 12, 0)),
        # disjoint -> its own span
        (1, _ts(1, 13, 0), _ts(1, 14, 0)),
        # other key unaffected
        (2, _ts(1, 10, 0), _ts(1, 10, 30)),
    ]
    df = spark.createDataFrame(rows, "user_id long, start timestamp, end timestamp")
    got = sorted(
        (r["user_id"], str(r["span_start"]), str(r["span_end"]), r["n_intervals"])
        for r in merge_intervals(df).collect()
    )
    assert got == [
        (1, "2024-03-01 10:00:00", "2024-03-01 12:00:00", 3),
        (1, "2024-03-01 13:00:00", "2024-03-01 14:00:00", 1),
        (2, "2024-03-01 10:00:00", "2024-03-01 10:30:00", 1),
    ]


def test_contamination_score_fraction(spark):
    from pysparkflow.llmops.decontam import contamination_score

    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # 4 tokens -> 1 shingle, fully contaminated
            (10, "alpha beta gamma delta"),
            # 5 tokens -> 2 shingles, 1 hit -> 0.5
            (11, "alpha beta gamma delta epsilon"),
            # no overlap -> absent
            (12, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_shingles"], r["n_hits"], r["contamination"])
        for r in contamination_score(corpus, ev, n=4).collect()
    }
    assert got == {10: (1, 1, 1.0), 11: (2, 1, 0.5)}


def test_cooccurrence_similarity_jaccard(spark):
    from pysparkflow.operators.cooccurrence import cooccurrence_similarity

    rows = [
        # items 1,2 together in baskets a,b; item 1 also alone in c
        ("a", 1), ("a", 2), ("b", 1), ("b", 2), ("c", 1),
        # hub basket wider than max_basket contributes nothing
        ("h", 1), ("h", 2), ("h", 3), ("h", 4),
    ]
    df = spark.createDataFrame(rows, "b string, i long")
    got = cooccurrence_similarity(
        df, "b", "i", min_count=2, max_basket=3
    ).collect()
    assert len(got) == 1
    r = got[0]
    # J = 2 / (3 + 2 - 2)
    assert (r["item_a"], r["item_b"], r["co_count"]) == (1, 2, 2)
    assert abs(r["jaccard"] - 2 / 3) < 1e-12


def test_cooccurrence_null_keys_match_join_semantics(spark):
    """r13 opt pin: the window-based hub filter must keep the old join
    form's NULL-key behavior — a NULL basket contributes nothing, a NULL
    item never pairs and never surfaces in degrees, but DOES count
    toward the basket-width hub filter (a 3-item basket with a NULL
    item is 4 wide and must be hub-dropped at max_basket=3)."""
    from pysparkflow.operators.cooccurrence import cooccurrence_similarity

    rows = [
        # basket a: 3 real items + NULL -> width 4 -> dropped at mb=3
        ("a", 1), ("a", 2), ("a", 3), ("a", None),
        # baskets b, c: items 1,2 together twice
        ("b", 1), ("b", 2), ("c", 1), ("c", 2), ("c", None),
        # NULL basket: contributes nothing anywhere
        (None, 1), (None, 2),
    ]
    df = spark.createDataFrame(rows, "b string, i int")
    got = cooccurrence_similarity(df, "b", "i", min_count=2, max_basket=3)
    out = got.collect()
    assert len(out) == 1
    r = out[0]
    # basket c is width 3 (2 items + NULL) -> kept; co=2 over deg 2,2
    assert (r["item_a"], r["item_b"], r["co_count"]) == (1, 2, 2)
    assert abs(r["jaccard"] - 2 / 2) < 1e-12


def test_nucleus_select_prefix(spark):
    from pysparkflow.llmops.sampling import nucleus_select

    rows = [
        ("g", 1, 50.0), ("g", 2, 30.0), ("g", 3, 15.0), ("g", 4, 5.0),
    ]
    df = spark.createDataFrame(rows, "t string, id long, v double")
    # 50% of mass=100: row 1 (cum_before 0) qualifies; row 2's cum
    # before is 50, not < 50 -> exactly the crossing row is kept
    got = nucleus_select(df, "t", "id", "v", p_pct=50).collect()
    assert [r["id"] for r in got] == [1]
    # 60%: rows 1 and 2
    got = nucleus_select(df, "t", "id", "v", p_pct=60).collect()
    assert sorted(r["id"] for r in got) == [1, 2]
    # 100%: everything
    assert nucleus_select(df, "t", "id", "v", p_pct=100).count() == 4


def test_hash_split_deterministic_and_complete(spark):
    from pysparkflow.llmops.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = {r["id"]: r["split"] for r in hash_split(df).collect()}
    b = {r["id"]: r["split"] for r in hash_split(df).collect()}
    assert a == b  # deterministic
    assert len(a) == 2000  # total, no drops
    from collections import Counter

    c = Counter(a.values())
    # 80/10/10 within a loose band at n=2000
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.06 < c["val"] / 2000 < 0.14
    assert 0.06 < c["test"] / 2000 < 0.14
