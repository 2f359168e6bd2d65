"""Round-11 additions: the four ADVICE r10 closures (rank_fusion NULL
ordering pin, windowed_type_drift alias validation, cluster_stats
broadcast gate, centroid_affinity docstring) and the semantic_dedup
operators (semantic_dedup — SemDeDup-style cluster-bucketed embedding
dedup — and semantic_contamination — embedding-level benchmark
decontamination)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- ADVICE r10 #1: rank_fusion NULL-signal ordering ------------------


def test_rank_fusion_null_signal_ranks_worst(spark):
    """A NULL signal value ranks WORST (asc_nulls_first pinned): the
    null-signal doc gets the lowest percent_rank and is dropped at
    keep_frac=0.5, matching what a NULLS FIRST oracle replays."""
    from pysparkflow.llmops.quality_model import rank_fusion

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", None), (3, "a", 1.0), (4, "a", 9.0)],
        "doc_id long, source string, sig double",
    )
    out = rank_fusion(
        df,
        signals={"s": F.col("sig")},
        weights={"s": 1.0},
        keep_frac=0.5,
    )
    rows = {r["id"]: r for r in out.collect()}
    # null first => fused ranks: 2 -> 0.0, 3 -> 1/3, 1 -> 2/3, 4 -> 1.0
    assert rows[2]["fused"] == 0.0 and rows[2]["keep"] is False
    assert rows[4]["fused"] == 1.0 and rows[4]["keep"] is True
    assert rows[1]["keep"] is True and rows[3]["keep"] is False


def test_rank_fusion_null_matches_nulls_first_oracle(spark):
    """The pinned ordering replays in DuckDB with explicit NULLS FIRST —
    the divergence ADVICE r10 flagged (engine-default NULLS placement)
    is now a deterministic contract."""
    import duckdb

    from pysparkflow.llmops.quality_model import rank_fusion

    data = [(1, "a", 5.0), (2, "a", None), (3, "b", None), (4, "b", 2.0)]
    df = spark.createDataFrame(data, "doc_id long, source string, sig double")
    got = {
        (r["id"], r["partition"]): (r["fused"], r["keep"])
        for r in rank_fusion(
            df, {"s": F.col("sig")}, {"s": 1.0}, keep_frac=0.5
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, source VARCHAR, sig DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            """
            SELECT doc_id, source, round(f, 6) AS fused,
                   round(f, 6) >= 0.5 AS keep
            FROM (
              SELECT doc_id, source,
                     1.0 * percent_rank() OVER (
                       PARTITION BY source
                       ORDER BY sig NULLS FIRST, doc_id) AS f
              FROM t)
            """
        ).fetchall()
    }
    assert got == want


# --- ADVICE r10 #2: windowed_type_drift alias validation ---------------


def test_windowed_type_drift_rejects_unsafe_types(spark):
    from pysparkflow.streaming.events import windowed_type_drift

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.col("timestamp").alias("ts"), F.lit("a").alias("event_type"))
    )
    with pytest.raises(ValueError, match="duplicate"):
        windowed_type_drift(stream, ["a", "a"])
    with pytest.raises(ValueError, match="reserved"):
        windowed_type_drift(stream, ["a", "events"])
    with pytest.raises(ValueError, match="alias"):
        windowed_type_drift(stream, ["a", "b-c"])
    with pytest.raises(ValueError, match="alias"):
        windowed_type_drift(stream, ["a", "1x"])
    # the happy path still constructs
    windowed_type_drift(stream, ["a", "b_2", "C"])


# --- ADVICE r10 #3: cluster_stats broadcast gate -----------------------


def test_cluster_stats_shuffle_fallback_matches_broadcast(spark):
    """broadcast=False degrades to a shuffle join with identical output
    — the escape hatch for mass-duplication corpora where the resolved
    cluster table approaches corpus scale."""
    from pysparkflow.llmops.dedup import cluster_stats

    docs = spark.createDataFrame(
        [(i, "s1" if i % 2 else "s2") for i in range(1, 11)],
        "doc_id long, source string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "doc_id long, keep_id long",
    )
    a = sorted(map(tuple, cluster_stats(clusters, docs).collect()))
    b = sorted(
        map(tuple, cluster_stats(clusters, docs, broadcast=False).collect())
    )
    assert a == b and a
    # and the hint really is absent from the un-broadcast plan
    plan = cluster_stats(clusters, docs, broadcast=False)._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in plan


# --- semantic_dedup (SemDeDup, VERDICT r10 #5) --------------------------


def _planted_emb(spark):
    """Two well-separated directions; within each, planted near-parallel
    copies (paraphrases) plus one orthogonal-ish singleton."""
    import numpy as np

    rng = np.random.default_rng(7)
    base_a = rng.normal(size=8)
    base_b = rng.normal(size=8)
    base_b -= base_b @ base_a / (base_a @ base_a) * base_a  # orthogonal
    rows = []
    # ids 1..3: copies of direction A (cosine ~1 to each other)
    for i, eps in [(1, 0.0), (2, 1e-3), (3, 2e-3)]:
        v = base_a + eps * base_b
        rows.append((i, [float(x) for x in v]))
    # ids 4..5: copies of direction B
    for i, eps in [(4, 0.0), (5, 1e-3)]:
        v = base_b + eps * base_a
        rows.append((i, [float(x) for x in v]))
    # id 6: an isolated mixture, far from both in cosine
    rows.append((6, [float(x) for x in (0.5 * base_a - 0.5 * base_b)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_planted_paraphrases(spark):
    """Planted near-parallel copies are dropped, cluster-minimum ids and
    isolated vectors survive, and the keep decision replays from the
    published rounded column."""
    from pysparkflow.llmops.semdedup import semantic_dedup

    emb = _planted_emb(spark)
    out = semantic_dedup(emb, k=2, rounds=2, threshold=0.99, chunk_rows=2)
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 6
    # the first id of each paraphrase group survives; later copies drop
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False and rows[2]["max_prior_cosine"] >= 0.99
    assert rows[3]["keep"] is False
    # id 4 is its direction-B cluster's minimum id: no smaller
    # same-cluster vector exists, so the prior is NULL and it survives
    # (the concrete pin ADVICE r11 asked for — the old three-way OR was
    # satisfiable by any outcome)
    assert rows[4]["keep"] is True and rows[4]["max_prior_cosine"] is None
    assert rows[5]["keep"] is False and rows[5]["max_prior_cosine"] >= 0.99
    # ids 4 and 5 share a cluster distinct from the direction-A ids
    assert rows[4]["cluster"] == rows[5]["cluster"] != rows[1]["cluster"]
    # keep replays from the published column
    for r in rows.values():
        m = r["max_prior_cosine"]
        assert r["keep"] == (m is None or m < 0.99)


def test_semantic_dedup_prior_rule_exact(spark):
    """max_prior_cosine equals the numpy upper-triangular within-cluster
    max at 4 dp, for every vector — chunking (chunk_rows=2 forces cross-
    block pairs in both id directions) must not change the answer."""
    import numpy as np

    from pysparkflow.llmops.semdedup import semantic_dedup

    rng = np.random.default_rng(11)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=6)]) for i in range(1, 21)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(emb, k=3, rounds=2, threshold=0.5, chunk_rows=2)
    got = {r["id"]: r["max_prior_cosine"] for r in out.collect()}
    clusters = {r["id"]: r["cluster"] for r in out.collect()}
    X = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    for i, v in X.items():
        priors = [
            float(
                X[j] @ v / (np.linalg.norm(X[j]) * np.linalg.norm(v))
            )
            for j in X
            if j < i and clusters[j] == clusters[i]
        ]
        want = round(max(priors), 4) if priors else None
        assert got[i] == pytest.approx(want) if want is not None else got[i] is None


def test_semantic_dedup_output_is_per_vector(spark):
    """Output is O(N): exactly one row per input vector regardless of
    duplication rate (an all-duplicates corpus must not blow up)."""
    from pysparkflow.llmops.semdedup import semantic_dedup

    n = 50
    rows = [(i, [1.0, 0.0, 0.0, float(i) * 1e-9]) for i in range(1, n + 1)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(emb, k=2, rounds=1, threshold=0.9, chunk_rows=8)
    rws = out.collect()
    assert len(rws) == n
    kept = [r["id"] for r in rws if r["keep"]]
    # mass duplication: only the cluster-minimum ids survive
    assert len(kept) <= 2 and 1 in kept


# --- driver-window rotation (VERDICT r10 #1/#2) -------------------------


def test_driver_window_rotation_r11():
    """The r11 contract's spillover pin was HONORED and graded: the ten
    alphabetically-last r8 entries it named led the r12 front and carry
    hash-match rows in the committed CORRECTNESS_r12.json. Pinned
    against the artifact (not _ROUND_FRONT, which has since rotated to
    the r13 composition — tests/test_round13_ops.py)."""
    import json
    from pathlib import Path

    art = Path(__file__).resolve().parents[1] / "CORRECTNESS_r12.json"
    graded = json.loads(art.read_text())
    for k in ("session_paths", "snapshot_diff", "sql_revenue",
              "sssp_bounded", "temperature_mixture", "tfidf_terms",
              "triangle_count", "weighted_sample", "window_suite",
              "zscore_anomaly"):
        assert graded[k]["hash_match"], k


# --- semantic_contamination (embedding-level decontamination) -----------


def test_semantic_contamination_planted(spark):
    """Closed-form plants: a corpus copy of a benchmark direction is
    flagged (cosine exactly 1.0); an orthogonal vector scores exactly
    0.0; a 45-degree mixture scores exactly 0.7071; the gate replays
    from the published rounded column."""
    from pysparkflow.llmops.decontam import semantic_contamination

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [2.0, 0.0, 0.0, 0.0]),   # scaled copy of bench axis 0
            (2, [0.0, 0.0, 3.0, 0.0]),   # orthogonal to both
            (3, [1.0, 1.0, 0.0, 0.0]),   # 45 deg to both -> 0.7071
            (4, [0.0] * 4),              # zero vector -> cosine 0
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["id"]: r
        for r in semantic_contamination(corpus, bench, threshold=0.9).collect()
    }
    assert rows[1]["max_bench_cosine"] == 1.0 and rows[1]["contaminated"]
    assert rows[2]["max_bench_cosine"] == 0.0 and not rows[2]["contaminated"]
    assert rows[3]["max_bench_cosine"] == 0.7071 and not rows[3]["contaminated"]
    assert rows[4]["max_bench_cosine"] == 0.0 and not rows[4]["contaminated"]
    for r in rows.values():
        m = r["max_bench_cosine"]
        assert r["contaminated"] == (m is not None and m >= 0.9)


def test_semantic_contamination_empty_benchmark_and_size_gate(spark):
    """Empty benchmark: every row NULL + not contaminated (total
    contract). Oversized benchmark: the size gate raises instead of
    collecting a corpus to the driver."""
    import pytest as _pytest

    from pysparkflow.llmops.decontam import semantic_contamination

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    empty = corpus.where("vec_id < 0")
    rows = semantic_contamination(corpus, empty, threshold=0.5).collect()
    assert len(rows) == 2
    assert all(
        r["max_bench_cosine"] is None and r["contaminated"] is False
        for r in rows
    )
    with _pytest.raises(ValueError, match="max_bench_rows"):
        semantic_contamination(
            corpus, corpus, threshold=0.5, max_bench_rows=1
        )


def test_semantic_contamination_plan_is_map_only(spark, sf_dir):
    """The 100 TB contract in the physical plan: the corpus side is ONE
    Arrow pass over the scan — ZERO exchanges (the benchmark travels in
    the task closure, not through a join)."""
    from pysparkflow.relational.registry import QUERIES

    df = QUERIES["semantic_contamination"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_semantic_contamination_empty_corpus(spark):
    """Empty corpus: empty output with the pinned schema (totality over
    the other side too)."""
    from pysparkflow.llmops.decontam import semantic_contamination

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = semantic_contamination(emb.where("vec_id < 0"), emb, threshold=0.5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "id", "max_bench_cosine", "contaminated"
    ]


# --- round-11 code-review fixes ------------------------------------------


def test_windowed_type_drift_rejects_case_collisions(spark):
    """Spark/DuckDB resolve columns case-insensitively: 'Events' would
    collide with n_events and 'Click'/'click' would be ambiguous —
    the guard must fold case (code-review r11)."""
    from pysparkflow.streaming.events import windowed_type_drift

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.col("timestamp").alias("ts"), F.lit("a").alias("event_type"))
    )
    with pytest.raises(ValueError, match="reserved"):
        windowed_type_drift(stream, ["a", "Events"])
    with pytest.raises(ValueError, match="duplicate"):
        windowed_type_drift(stream, ["click", "Click"])


def test_embedding_kernels_reject_non_integral_ids(spark):
    """String ids would die deep in the Arrow worker ('id long' kernel
    schemas); both embedding-space operators raise up front instead
    (code-review r11)."""
    from pysparkflow.llmops.decontam import semantic_contamination
    from pysparkflow.llmops.semdedup import semantic_dedup

    emb = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "vec_id string, embedding array<float>",
    )
    with pytest.raises(ValueError, match="integral"):
        semantic_contamination(emb, emb, threshold=0.5)
    with pytest.raises(ValueError, match="integral"):
        semantic_dedup(emb, k=2, rounds=1, threshold=0.5)


def test_semantic_contamination_null_embedding_total(spark):
    """A NULL corpus embedding scores NULL / not-contaminated inside the
    single map pass — matching the oracle's NULL-ignoring max — and an
    int (not long) id column still works, with the same LongType output
    on both the empty- and non-empty-benchmark paths (code-review r11)."""
    from pyspark.sql.types import LongType

    from pysparkflow.llmops.decontam import semantic_contamination

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 2.0])],
        "vec_id int, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(9, [1.0, 0.0])], "vec_id int, embedding array<float>"
    )
    out = semantic_contamination(corpus, bench, threshold=0.9)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[2]["max_bench_cosine"] is None
    assert rows[2]["contaminated"] is False
    assert rows[1]["max_bench_cosine"] == 1.0 and rows[1]["contaminated"]
    assert isinstance(out.schema["id"].dataType, LongType)
    empty = semantic_contamination(corpus, bench.where("vec_id < 0"), 0.9)
    assert isinstance(empty.schema["id"].dataType, LongType)
    # the one-pass contract survives the NULL handling
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_semantic_dedup_assignment_is_persisted(spark):
    """The assignment feeds three consumers; it must be a tracked
    persist so collect does not replay the k x dim distance fold per
    consumer (code-review r11)."""
    from pysparkflow.llmops.semdedup import semantic_dedup

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(1, 9)],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(emb, k=2, rounds=1, threshold=0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert out.count() == 8
    from pysparkflow.engine.cache import release_tracked

    release_tracked()
