"""Round-7 operators: leakage-safe cluster_split and BM25 ranking."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pysparkflow.llmops.sampling import cluster_split, hash_split
from pysparkflow.llmops.tfidf import bm25_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cluster_split_near_dups_never_straddle(spark):
    """Every member of a near-dup cluster lands in the SAME split —
    including transitively-linked members — keyed by the survivor id."""
    docs = _docs(spark, [(i, f"doc {i}") for i in range(100)])
    # clusters: {1,2,3} -> keep 1; {40,41} -> keep 40
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (40, 40), (41, 40)], "doc_id long, keep_id long"
    )
    got = {r.id: (r.split_key, r.split) for r in cluster_split(docs, clusters).collect()}
    assert len(got) == 100
    assert got[1] == got[2] == got[3]  # one cluster, one split
    assert got[40] == got[41]
    assert got[1][0] == 1 and got[40][0] == 40  # keyed by survivor


def test_cluster_split_matches_hash_split_outside_clusters(spark):
    """Unclustered documents get EXACTLY the hash_split assignment —
    cluster_split is a superset-compatible extension, not a new split."""
    docs = _docs(spark, [(i, f"doc {i}") for i in range(200)])
    clusters = spark.createDataFrame([(7, 3)], "doc_id long, keep_id long")
    cs = {r.id: r.split for r in cluster_split(docs, clusters).collect()}
    hs = {r.id: r.split for r in hash_split(docs).collect()}
    assert all(cs[i] == hs[i] for i in range(200) if i != 7)
    assert cs[7] == hs[3]  # the clustered doc follows its survivor


def test_cluster_split_partition_invariant(spark):
    docs = _docs(spark, [(i, f"doc {i}") for i in range(100)])
    clusters = spark.createDataFrame([(5, 2), (9, 2)], "doc_id long, keep_id long")
    a = sorted(map(tuple, cluster_split(docs, clusters).collect()))
    b = sorted(map(tuple, cluster_split(docs.repartition(13), clusters).collect()))
    assert a == b


def test_bm25_scores_match_handrolled(spark):
    """BM25 on a 4-doc corpus matches the formula computed in Python."""
    rows = [
        (0, "spark join join"),
        (1, "spark spark spark filter"),
        (2, "filter scan scan"),
        (3, "join"),
    ]
    docs = _docs(spark, rows)
    got = {r.doc_id: r.score for r in bm25_scores(docs, ["spark", "join"]).collect()}

    # hand-rolled reference
    toks = {d: t.split() for d, t in rows}
    n = len(rows)
    dl = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dl.values()) / n
    k1, b = 1.2, 0.75

    def idf(term):
        df = sum(1 for t in toks.values() if term in t)
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def bm25(d):
        s = 0.0
        for term in ("spark", "join"):
            tf = toks[d].count(term)
            if tf:
                s += idf(term) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[d] / avgdl))
        return round(s, 6)

    expect = {d: bm25(d) for d in toks if bm25(d) > 0}
    assert got == expect


def test_bm25_rank_deterministic_and_bounded(spark):
    docs = _docs(spark, [(i, "spark " * (i % 5 + 1)) for i in range(50)])
    out = bm25_scores(docs, ["spark"], top_k=10).collect()
    assert len(out) == 10
    ranks = [r.rank for r in out]
    assert ranks == list(range(1, 11))
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_plan_has_no_corpus_window(spark):
    """The top-k must be TakeOrderedAndProject (distributed top-k), not a
    single-partition global window over the scored corpus."""
    docs = _docs(spark, [(i, "spark scan") for i in range(20)])
    plan = bm25_scores(docs, ["spark"])._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_heavy_hitters_exact_with_planted_skew(spark):
    """Planted heavy keys recovered exactly; tail keys excluded even
    when they sneak into the KPS candidate superset."""
    from pysparkflow.operators.heavyhitters import heavy_hitters

    # key 0 -> 50 rows, key 1 -> 20 rows, keys 2..101 -> 3 rows each
    df = spark.range(50).select(F.lit(0).alias("k")).unionAll(
        spark.range(20).select(F.lit(1).alias("k"))
    ).unionAll(
        spark.range(300).select((F.col("id") % 100 + 2).alias("k"))
    )
    got = {r.key: r.n_rows for r in heavy_hitters(df, "k", min_count=20).collect()}
    assert got == {0: 50, 1: 20}  # boundary count (exactly 20) included


def test_heavy_hitters_low_threshold_falls_back_exact(spark):
    """Below freqItems' support floor, pruning would be unsound — the
    operator must take the plain exact plan and stay complete."""
    from pysparkflow.operators.heavyhitters import heavy_hitters

    # n=200k, min_count=5 -> support 2.25e-5 < 1e-4 floor
    df = spark.range(200_000).select((F.col("id") % 40_000).alias("k"))
    out = heavy_hitters(df, "k", min_count=5, total_rows=200_000)
    assert out.count() == 40_000  # every key has exactly 5 rows
    assert "freqItems" not in out._jdf.queryExecution().toString()


def test_heavy_hitters_partition_invariant(spark):
    from pysparkflow.operators.heavyhitters import heavy_hitters

    df = spark.range(1000).select((F.col("id") % 37).alias("k"))
    a = sorted(map(tuple, heavy_hitters(df, "k", min_count=27).collect()))
    b = sorted(
        map(tuple, heavy_hitters(df.repartition(17), "k", min_count=27).collect())
    )
    assert a == b and len(a) > 0


def test_psi_drift_identical_snapshots_near_zero(spark):
    """Identical distributions -> PSI ~ 0 (smoothing keeps it tiny but
    finite when the two halves differ only by sampling)."""
    from pysparkflow.llmops.drift import psi_drift

    rows = [(i, "a", float(i % 500)) for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = psi_drift(df, snapshot_col=F.col("event_id") % 2 == 1).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_ref == 1000 and r.n_cur == 1000
    # i%2 alternates with i%500 uniformly: both halves see every bin
    # equally -> exactly zero up to rounding
    assert abs(r.psi) < 1e-6


def test_psi_drift_planted_shift_matches_handrolled(spark):
    """A planted location shift produces the exact hand-computed PSI."""
    import math

    from pysparkflow.llmops.drift import psi_drift

    # ref: all values in bin 0; cur: all values in bin 9
    rows = [(i, "g", 1.0) for i in range(0, 100, 2)] + [
        (i, "g", 499.0) for i in range(1, 100, 2)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = psi_drift(df, snapshot_col=F.col("event_id") % 2 == 1).collect()[0]

    def term(cur_n, ref_n):
        p = (cur_n + 0.5) / (50 + 5.0)
        q = (ref_n + 0.5) / (50 + 5.0)
        return (p - q) * math.log(p / q)

    expect = round(term(0, 50) + term(50, 0) + 8 * term(0, 0), 6)
    assert r.psi == expect and r.psi > 0.25  # "shifted" by the usual read


def test_psi_drift_empty_bins_both_sides_contribute_zero(spark):
    """Bins empty on BOTH sides cancel exactly even when the snapshot
    totals differ (the scaffold materializes them; p != q only from the
    totals, handled by the smoothed formula)."""
    from pysparkflow.llmops.drift import psi_drift

    # unbalanced halves: 60 ref rows, 40 cur rows, same single bin
    rows = [(i, "g", 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = psi_drift(df, snapshot_col=F.col("event_id") >= 60).collect()[0]
    assert r.n_ref == 60 and r.n_cur == 40
    # hand-rolled: 10 bins, bin0 holds everything
    import math

    def term(cur_n, ref_n):
        p = (cur_n + 0.5) / (40 + 5.0)
        q = (ref_n + 0.5) / (60 + 5.0)
        return (p - q) * math.log(p / q)

    expect = round(term(40, 60) + 9 * term(0, 0), 6)
    assert r.psi == expect
