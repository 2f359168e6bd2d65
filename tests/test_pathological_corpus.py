"""Pathological-corpus robustness: the text-pipeline operators must not
crash — and must produce defensible values — on the document shapes a
real 100 TB crawl contains: empty strings, whitespace-only, single
tokens, huge repeated docs, exotic unicode, regex metacharacters, and
(where the schema admits it) NULL text.

These are crash-freedom + sanity pins, not value oracles: the graded
values live in the DuckDB oracle gate; this file pins that the edge
shapes flow through the same plans without exceptions and without
NaN/negative outputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

PATHOLOGICAL = [
    (0, "src0", ""),                       # empty
    (1, "src0", "   "),                    # whitespace only
    (2, "src0", "x"),                      # single token
    (3, "src1", "a b"),                    # below shingle width
    (4, "src1", "the the the the the"),    # pure repetition
    (5, "src1", "éèê 中文 \U0001f600 token"),  # unicode + emoji
    (6, "src2", "a.b,c;d:e!f?g" * 40),     # punctuation wall, no spaces
    (7, "src2", "word " * 5000),           # long doc
    (8, "src2", "3.14 2.71 42 1e9 0x2A"),  # digit-heavy
    (9, "src3", "(.*) [a-z]+ \\1 $^ {2,3} |pipe| regex metachars"),
]


@pytest.fixture(scope="module")
def pdocs(spark):
    return spark.createDataFrame(
        PATHOLOGICAL, "doc_id long, source string, text string"
    )


def test_quality_gate_survives_pathological_text(pdocs):
    """The gate is TOTAL: every doc gets a boolean keep. An empty doc
    (n_chars=0) has null ratio features -> null score -> keep=False —
    previously Spark's ANSI division killed the job on the first empty
    doc (caught by this battery; fixed with try_divide, which also
    matches DuckDB's 0/0 -> NULL)."""
    from pysparkflow.llmops.quality_model import quality_classify

    rows = {r["id"]: r for r in quality_classify(pdocs).collect()}
    assert len(rows) == len(PATHOLOGICAL)
    for r in rows.values():
        assert r["keep"] is not None and r["n_tokens"] >= 1
        if r["q_score"] is not None:
            assert 0.0 <= r["q_score"] <= 1.0, r
    # the empty doc is the only unscorable one, and it is rejected
    assert rows[0]["q_score"] is None and rows[0]["keep"] is False
    assert all(rows[i]["q_score"] is not None for i in range(1, 10))


def test_textstats_survive_pathological_text(pdocs):
    from pysparkflow.llmops.textstats import quality_features

    for r in quality_features(pdocs).collect():
        for c in ("avg_token_len", "punct_ratio", "digit_ratio",
                  "stopword_ratio"):
            v = r[c]
            assert v is None or v >= 0.0, (r["id"], c, v)


def test_shingle_pipeline_survives_pathological_text(spark, pdocs):
    from pysparkflow.llmops.overlap import source_overlap

    rows = source_overlap(pdocs, n=3).collect()
    # every pair among sources that produced >= 1 shingle; no crashes,
    # no negative counts, jaccard in [0, 1]
    for r in rows:
        assert 0 <= r["n_common"] <= min(r["n_a"], r["n_b"])
        assert 0.0 <= r["jaccard"] <= 1.0


def test_dedup_exact_and_minhash_survive(spark, pdocs):
    from pysparkflow.llmops.dedup import exact_duplicates, minhash_lsh_pairs

    assert exact_duplicates(pdocs).count() >= 0
    # sub-shingle-width docs simply produce no signature rows
    assert minhash_lsh_pairs(pdocs).count() >= 0


def test_packing_survives_empty_and_huge_docs(spark, pdocs):
    from pysparkflow.llmops.packing import pack_documents, packing_report

    packed = pack_documents(pdocs, budget=64, n_buckets=2)
    assert packed.count() == len(PATHOLOGICAL)
    for r in packing_report(packed, 64).collect():
        assert r["n_examples"] >= 0 and r["n_spanning"] >= 0
        assert r["utilization"] is not None and r["utilization"] >= 0.0


def test_mixture_report_survives_pathological_corpus(spark, pdocs):
    from pysparkflow.llmops.quality_model import quality_classify
    from pysparkflow.llmops.report import mixture_report

    scored = quality_classify(pdocs)
    survivors = spark.createDataFrame([], "doc_id long, best_id long")
    rows = mixture_report(pdocs, scored, survivors).collect()
    assert sum(r["n_total"] for r in rows) == len(PATHOLOGICAL)
    for r in rows:
        assert 0.0 <= r["gate_rate"] <= 1.0


def test_similarity_family_survives_zero_vectors(spark):
    """A zero-norm embedding (failed embedder, padding row) has no
    direction: it joins no near-dup pair and ranks last in top-k —
    previously the Catalyst-side normalizations divided by the zero
    norm and Spark's ANSI '/' killed the job (numpy block paths already
    clamped; caught by this battery, fixed with the same clamp)."""
    from pysparkflow.llmops.similarity import (
        embedding_cosine_pairs,
        embedding_near_dups_lsh,
        knn_graph,
    )

    emb = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [1.0] + [0.0] * 7), (3, [0.5] * 8),
         (4, [0.5] * 8)],
        "vec_id long, embedding array<float>",
    )
    exact = embedding_cosine_pairs(emb, threshold=0.9).collect()
    assert sorted((r["id_a"], r["id_b"]) for r in exact) == [(3, 4)]
    lsh = embedding_near_dups_lsh(emb, threshold=0.9, dim=8).collect()
    assert all((r[0], r[1]) != (1, 2) and 1 not in (r[0], r[1]) for r in lsh)
    g = knn_graph(emb, k=2, dim=8).collect()
    assert all(r[1] != 1 for r in g)  # zero vector is nobody's neighbor


def test_cosine_similarity_total_over_zero_vectors(spark):
    from pysparkflow.functions.vector import cosine_similarity

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 0.0]), ([0.0, 0.0], [0.0, 0.0]),
         ([1.0, 0.0], [1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    vals = [r[0] for r in df.select(cosine_similarity("a", "b")).collect()]
    assert vals == [0.0, 0.0, 1.0]
    # subnormal-magnitude embeddings (ADVICE r9): each norm ~1e-160, so
    # the norm PRODUCT underflows past the old 1e-300 clamp while staying
    # nonzero — the clamp scaled the quotient to ~1e-20; try_divide keeps
    # the IEEE-exact cosine (parallel -> 1.0, orthogonal -> 0.0)
    tiny = spark.createDataFrame(
        [([1e-160, 0.0], [1e-160, 0.0]), ([1e-160, 0.0], [0.0, 1e-160])],
        "a array<double>, b array<double>",
    )
    tv = [r[0] for r in tiny.select(cosine_similarity("a", "b")).collect()]
    assert tv == [1.0, 0.0]


def test_zscore_outliers_survive_constant_series(spark):
    """An idle sensor (constant value) has stddev 0: its z-scores are
    null and it flags nothing — previously ANSI '/' killed the job
    (third find of this battery; DuckDB's 0/0 -> NULL agrees with the
    try_divide fix). A genuinely varying group still flags."""
    from pysparkflow.operators.timeseries import zscore_outliers

    rows = (
        [(1, 5.0)] * 10
        + [(2, 0.0)] * 10 + [(2, 1000.0)]
        + [(3, 7.0)]
    )
    df = spark.createDataFrame(rows, "key long, value double")
    out = zscore_outliers(df, "key", "value").collect()
    assert all(r["key"] == 2 for r in out) and len(out) == 1


def test_llmops_family_total_over_empty_inputs(spark):
    """Empty-input totality (fourth find of the battery): a filter that
    matches nothing upstream must yield an empty result downstream, not
    a crash. temperature_mixture previously hit None arithmetic from
    the empty scalar aggregate; the centroid family (cosine pairs,
    knn_ivf, cluster_balanced_sample) crashed fitting cells on an empty
    sample."""
    from pysparkflow.llmops.overlap import source_overlap
    from pysparkflow.llmops.packing import pack_documents, packing_report
    from pysparkflow.llmops.quality_model import quality_classify
    from pysparkflow.llmops.report import mixture_report
    from pysparkflow.llmops.sampling import temperature_mixture
    from pysparkflow.llmops.similarity import (
        cluster_balanced_sample,
        embedding_cosine_pairs,
        knn_ivf,
    )

    docs = spark.createDataFrame([], "doc_id long, source string, text string")
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    one_q = spark.createDataFrame(
        [(1, [1.0] * 8)], "vec_id long, embedding array<float>"
    )
    scored = quality_classify(docs)
    surv = spark.createDataFrame([], "doc_id long, best_id long")
    assert temperature_mixture(docs, group_col="source").count() == 0
    assert embedding_cosine_pairs(emb, threshold=0.5).count() == 0
    assert knn_ivf(emb, one_q, k=2).count() == 0
    assert cluster_balanced_sample(emb).count() == 0
    assert mixture_report(docs, scored, surv).count() == 0
    assert source_overlap(docs).count() == 0
    assert packing_report(pack_documents(docs, budget=64), 64).count() == 0


def test_graph_family_pathology_contracts(spark):
    """Degenerate graphs flow 0 (or raise the documented contract),
    never crash: absent sink, empty graph, self-loops, missing BFS
    source. Pinned so the iterative engine's edge behavior can't drift
    silently."""
    from pysparkflow.algo import bfs_distances, max_flow
    from pysparkflow.graph.graph import FlowGraph

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    g = FlowGraph.from_edge_pairs(spark, pairs)
    assert max_flow(g, sources=[1], sinks=[99]).value == 0
    with pytest.raises(ValueError, match="disjoint"):
        max_flow(g, sources=[1], sinks=[1])
    # absent BFS source: only the virtual root row, no spurious reach
    assert len(bfs_distances(g, sources=[99]).collect()) <= 1
    empty = spark.createDataFrame([], "src long, dst long")
    assert max_flow(
        FlowGraph.from_edge_pairs(spark, empty), sources=[1], sinks=[2]
    ).value == 0
    loops = spark.createDataFrame([(1, 1), (1, 2)], "src long, dst long")
    assert max_flow(
        FlowGraph.from_edge_pairs(spark, loops), sources=[1], sinks=[2]
    ).value == 1


def test_scrub_and_langid_survive(spark, pdocs):
    from pysparkflow.llmops.scrub import scrub_text
    from pysparkflow.llmops.textstats import language_scores

    assert scrub_text(pdocs).count() == len(PATHOLOGICAL)
    for r in language_scores(pdocs).collect():
        assert r["lang_pred"] is not None


def test_round10_ops_survive_pathological_corpus(spark, pdocs):
    """Round-10 operators over the hostile corpus (same-commit battery
    rule): boilerplate_ngrams stays total (one row per doc, NULL ratio
    for sub-shingle docs, no ANSI divide crash); rank_fusion handles
    whole-partition ties (percent_rank well-defined, single-row
    partitions rank 0); cluster_stats tolerates clusters referencing
    absent docs and an empty pair set; centroid_affinity survives an
    empty embeddings table (no pairs, pinned schema)."""
    from pysparkflow.llmops.boilerplate import boilerplate_ngrams
    from pysparkflow.llmops.dedup import cluster_stats
    from pysparkflow.llmops.quality_model import rank_fusion
    from pysparkflow.llmops.similarity import centroid_affinity

    rows = boilerplate_ngrams(pdocs, n=3, min_docs=2).collect()
    assert len(rows) == pdocs.count()
    assert all(r["n_boiler"] <= r["n_shingles"] for r in rows)
    assert all(
        (r["boiler_ratio"] is None) == (r["n_shingles"] == 0) for r in rows
    )
    # "word word word ..." (doc 7): every shingle is the same trigram;
    # df must still be computed per DISTINCT doc, not per occurrence
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[7]["n_shingles"] == 1

    fused = rank_fusion(
        pdocs,
        {"len": F.length("text").cast("double")},
        {"len": 1.0},
        partition_col="source",
        id_col="doc_id",
    ).collect()
    assert len(fused) == pdocs.count()
    assert all(r["fused"] is not None and 0.0 <= r["fused"] <= 1.0
               for r in fused)
    # src3 is a single-row partition: percent_rank is 0 by definition
    assert [r["fused"] for r in fused if r["partition"] == "src3"] == [0.0]

    clusters = spark.createDataFrame(
        [(0, 0), (999, 0)], "doc_id long, keep_id long"  # 999 absent
    )
    stats = cluster_stats(clusters, pdocs).collect()
    assert [(r["cluster_size"], r["n_docs"]) for r in stats] == [(1, 1)]
    empty_pairs = clusters.where(F.lit(False))
    assert cluster_stats(empty_pairs, pdocs).count() == 0

    empty_emb = spark.createDataFrame(
        [], "vec_id long, label int, embedding array<double>"
    )
    out = centroid_affinity(empty_emb)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "group_a", "group_b", "n_a", "n_b", "cosine"
    ]

    from pysparkflow.llmops.similarity import embedding_outliers

    # empty input: empty output, pinned schema, no crash
    eo = embedding_outliers(empty_emb)
    assert eo.count() == 0
    assert [f.name for f in eo.schema.fields] == [
        "vec_id", "group", "dist", "pr", "is_outlier"
    ]
    # single-member group: dist 0, percent_rank 0, never an outlier;
    # zero vectors are fine (no division anywhere)
    one = spark.createDataFrame(
        [(1, 7, [0.0, 0.0])], "vec_id long, label int, embedding array<double>"
    )
    (r,) = embedding_outliers(one).collect()
    assert (r["dist"], r["pr"], r["is_outlier"]) == (0.0, 0.0, False)


def test_round11_battery_r10_ops(spark, pdocs):
    """VERDICT r10 #7 — the r9 robustness discipline propagated to the
    r10 operators, the cases the r10 battery above missed:
    boilerplate_ngrams on an ALL-empty-text corpus, centroid_affinity
    with a single group (empty pair matrix, pinned schema),
    mixture_drift where a source exists in only one snapshot with zero
    kept docs (finite scores, no NULL arithmetic crash), and
    events_stream_drift with zero finalized windows."""
    from pysparkflow.llmops.boilerplate import boilerplate_ngrams
    from pysparkflow.llmops.quality_model import quality_classify
    from pysparkflow.llmops.report import mixture_drift, mixture_report
    from pysparkflow.llmops.similarity import centroid_affinity

    # all-empty corpus: zero shingles everywhere -> n_boiler 0, NULL
    # ratio, one row per doc (totality)
    empty_docs = spark.createDataFrame(
        [(i, "s", "") for i in range(5)] + [(5, "s", "   ")],
        "doc_id long, source string, text string",
    )
    rows = boilerplate_ngrams(empty_docs, n=3, min_docs=2).collect()
    assert len(rows) == 6
    assert all(
        r["n_shingles"] == 0 and r["n_boiler"] == 0
        and r["boiler_ratio"] is None
        for r in rows
    )

    # single group: no pairs, schema intact
    one_group = spark.createDataFrame(
        [(1, 7, [1.0, 0.0]), (2, 7, [0.0, 1.0])],
        "vec_id long, label int, embedding array<double>",
    )
    out = centroid_affinity(one_group)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "group_a", "group_b", "n_a", "n_b", "cosine"
    ]

    # snapshot diff where src_only_a exists only in A and src_zero has
    # zero kept docs in B (all-null quantiles coalesced): every drift
    # column finite or a well-defined count, no crash
    surv = spark.createDataFrame([], "doc_id long, best_id long")
    docs_a = pdocs  # src0..src3
    docs_b = spark.createDataFrame(
        [(100, "src_zero", ""), (101, "src0", "good fluent prose here")],
        "doc_id long, source string, text string",
    )
    rep_a = mixture_report(docs_a, quality_classify(docs_a), surv)
    rep_b = mixture_report(docs_b, quality_classify(docs_b), surv)
    drift = {r["source"]: r for r in mixture_drift(rep_a, rep_b).collect()}
    # full-outer: one-snapshot sources keep a row with 0-read counts
    assert "src1" in drift and "src_zero" in drift
    import math

    for r in drift.values():
        assert r["q_shift"] is not None and math.isfinite(r["q_shift"])
        assert r["q_w1"] is not None and math.isfinite(r["q_w1"])
    # src_zero gated everything out in B and is absent in A: defensible
    # zero counts, finite scores
    assert drift["src_zero"]["n_total_b"] == 1


def test_round11_battery_stream_drift_zero_windows(spark, tmp_path):
    """events_stream_drift with ZERO finalized windows: all events land
    inside the watermark delay, so append mode emits nothing — the
    monitor must return an empty frame with the pinned schema, not
    crash."""
    from pysparkflow.streaming.events import run_stream_drift_batchlike

    path = str(tmp_path / "events.parquet")
    # two events 1 second apart: max(ts) - 2h watermark finalizes no
    # 1-hour window
    spark.createDataFrame(
        [(1, "click", "2024-01-01 00:00:00"),
         (2, "view", "2024-01-01 00:00:01")],
        "event_id long, event_type string, ts_s string",
    ).select(
        "event_id", "event_type", F.to_timestamp("ts_s").alias("ts")
    ).write.mode("overwrite").parquet(path)
    out = run_stream_drift_batchlike(
        spark, path, ["click", "view"], query_name="drift_zero_win_test"
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "window_start", "n_click", "n_view", "n_events", "psi"
    ]


def test_round11_battery_semantic_dedup_zero_vectors(spark):
    """semantic_dedup over a corpus containing zero-norm embeddings
    (failed embedder rows): the norm clamp keeps the kernel total, the
    zero vectors get cosine 0 to everything (never dropped as dups of
    each other at any positive threshold... their mutual cosine is 0),
    and output stays one row per vector."""
    from pysparkflow.llmops.semdedup import semantic_dedup

    emb = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [0.0] * 4), (3, [1.0, 0.0, 0.0, 0.0]),
         (4, [1.0, 1e-6, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["id"]: r for r in
            semantic_dedup(emb, k=2, rounds=1, threshold=0.9).collect()}
    assert len(rows) == 4
    # zero vectors: cosine 0 to every prior -> kept
    assert rows[2]["keep"] is True
    # the planted near-copy of id 3 drops iff same cluster (it is: both
    # sit on the same axis)
    if rows[4]["cluster"] == rows[3]["cluster"]:
        assert rows[4]["keep"] is False
    for r in rows.values():
        m = r["max_prior_cosine"]
        assert r["keep"] == (m is None or m < 0.9)


def test_round12_battery_veckernel_contract():
    """The shared normalize helper (llmops/_veckernel.py, VERDICT r11
    #4): zero rows stay zero; subnormal-SQUARE rows keep IEEE unit
    vectors; full-underflow rows (every square -> 0) land in the zero
    branch instead of the old clamp's 1e100 garbage."""
    import numpy as np

    from pysparkflow.llmops._veckernel import l2_normalize_rows

    X = np.array(
        [
            [3.0, 4.0],        # ordinary
            [0.0, 0.0],        # exact zero
            [1e-160, 0.0],     # square is subnormal (1e-320) but nonzero
            [1e-200, 0.0],     # square underflows to 0 -> zero branch
        ]
    )
    out = l2_normalize_rows(X)
    assert np.allclose(out[0], [0.6, 0.8])
    assert (out[1] == 0).all()
    assert np.allclose(out[2], [1.0, 0.0])  # IEEE, not clamp-rescaled
    assert (out[3] == 0).all()  # old clamp produced [1e100, 0] here
    # input not mutated
    assert X[0, 0] == 3.0 and X[2, 0] == 1e-160


def test_round12_battery_semantic_dedup_subnormal(spark):
    """Subnormal-magnitude embeddings through the semdedup kernel: two
    parallel copies at 1e-160 (squares subnormal, norms nonzero) are
    TRUE duplicates (prior cosine 1.0 -> drop the later id); rows at
    1e-200 (computed norm underflows to 0) take the zero-vector branch
    — cosine 0 to everything, kept at any positive threshold."""
    from pysparkflow.llmops.semdedup import semantic_dedup

    emb = spark.createDataFrame(
        [
            (1, [1e-160, 0.0, 0.0, 0.0]),
            (2, [2e-160, 0.0, 0.0, 0.0]),   # parallel to id 1
            (3, [1e-200, 0.0, 0.0, 0.0]),   # full underflow -> zero branch
            (4, [1e-200, 0.0, 0.0, 0.0]),
            (5, [0.0, 1.0, 0.0, 0.0]),      # ordinary anchor
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["id"]: r for r in
            semantic_dedup(emb, k=1, rounds=1, threshold=0.9).collect()}
    assert len(rows) == 5
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False and rows[2]["max_prior_cosine"] == 1.0
    # zero-branch rows: cosine 0 to every prior, never dropped
    assert rows[3]["keep"] is True and rows[3]["max_prior_cosine"] == 0.0
    assert rows[4]["keep"] is True and rows[4]["max_prior_cosine"] == 0.0
    for r in rows.values():
        m = r["max_prior_cosine"]
        assert r["keep"] == (m is None or m < 0.9)


def test_round12_battery_semantic_contamination_subnormal(spark):
    """Same pins through the decontamination kernel: a subnormal-square
    corpus row parallel to a benchmark vector scores cosine 1.0
    (contaminated); a full-underflow row scores 0 (clean); NULL
    embeddings stay NULL/clean; a zero-norm BENCHMARK row is inert
    (cosine 0 against everything, flags nothing)."""
    from pysparkflow.llmops.decontam import semantic_contamination

    corpus = spark.createDataFrame(
        [
            (1, [1e-160, 0.0]),   # parallel to the benchmark direction
            (2, [1e-200, 0.0]),   # zero branch
            (3, None),            # failed embedder row
            (4, [0.0, 1.0]),      # orthogonal
        ],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(10, [2.0, 0.0]), (11, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["id"]: r for r in
            semantic_contamination(corpus, bench, threshold=0.9).collect()}
    assert rows[1]["contaminated"] is True
    assert rows[1]["max_bench_cosine"] == 1.0
    assert rows[2]["contaminated"] is False
    assert rows[2]["max_bench_cosine"] == 0.0
    assert rows[3]["contaminated"] is False
    assert rows[3]["max_bench_cosine"] is None
    assert rows[4]["contaminated"] is False
    assert rows[4]["max_bench_cosine"] == 0.0


def test_round12_battery_lsh_and_knngraph_underflow_rows(spark):
    """The two Catalyst-side normalizers (embedding_near_dups_lsh,
    knn_graph) follow the shared zero/subnormal contract after the r12
    fix: a full-underflow row (every square flushes to 0, computed norm
    0) normalizes to the ZERO vector via try_divide+coalesce — cosine 0
    to everything — instead of the old greatest(norm, 1e-300) clamp
    manufacturing ~1e100 elements and false near-dup pairs."""
    from pysparkflow.llmops.similarity import embedding_near_dups_lsh, knn_graph

    dim = 8
    rows = [
        (1, [1e-200] * dim),           # full underflow -> zero branch
        (2, [1e-200] * dim),           # identical underflow twin
        (3, [1.0] + [0.0] * (dim - 1)),
        (4, [1.0] + [1e-6] * (dim - 1)),  # true near-dup of id 3
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups_lsh(
            emb, threshold=0.9, n_bits=8, bands=4, dim=dim
        ).collect()
    }
    # underflow rows pair with NOTHING (cos 0 < any positive threshold);
    # pre-fix they scored cos ~inf against each other and everything
    assert all(1 not in p and 2 not in p for p in pairs)
    if (3, 4) in pairs:  # LSH recall < 1; when found, the cosine is real
        assert pairs[(3, 4)] > 0.9
    g = knn_graph(emb, k=2, n_bits=8, bands=4, dim=dim).collect()
    for r in g:
        assert r["cosine"] == r["cosine"]  # no NaN
        assert abs(r["cosine"]) <= 1.0 + 1e-12  # no 1e100 garbage edges
        if {r["id"], r["neighbor"]} & {1, 2}:
            assert abs(r["cosine"]) <= 1e-9


def test_round13_battery_bpe_train_hostile_corpora(spark):
    """bpe_train / bpe_train_encode are TOTAL over corpora the trainer
    can learn nothing from: a wordless corpus (digits/punct only — the
    \\p{L} word model sees zero words) trains to an EMPTY merge list
    and encodes every doc to totals of 0; non-Latin LETTERS are words
    under the round-13 Unicode contract and train real merges; an
    all-single-char corpus has no adjacent pairs and trains empty but
    still counts words; a corpus with fewer learnable pairs than
    n_merges stops early and the chain encodes with the short list."""
    from pysparkflow.llmops.bpe import bpe_train, bpe_train_encode

    wordless = spark.createDataFrame(
        [(1, "1234 --- 99"), (2, "42 !!! 7x7"), (3, "")],
        "doc_id long, text string",
    )
    # doc 2 has the one letter 'x' — a word with no pairs; still
    # nothing to train
    assert bpe_train(wordless, n_merges=4) == []
    out = {r["id"]: r for r in bpe_train_encode(wordless, 4).collect()}
    assert len(out) == 3
    assert out[1]["n_words"] == 0 and out[1]["n_bpe_tokens"] == 0
    assert out[1]["max_token"] is None
    assert out[3]["n_words"] == 0 and out[3]["max_token"] is None
    assert out[2]["n_words"] == 1 and out[2]["n_bpe_tokens"] == 1
    # non-Latin letters are WORDS now: the trainer learns from them
    unicode_corpus = spark.createDataFrame(
        [(1, "東京 東京 АБВ")], "doc_id long, text string"
    )
    learned = bpe_train(unicode_corpus, n_merges=2)
    assert learned == [("東", "京", 2), ("А".lower(), "Б".lower(), 1)]

    single = spark.createDataFrame(
        [(1, "a b c a"), (2, "z")], "doc_id long, text string"
    )
    assert bpe_train(single, n_merges=4) == []
    out = {r["id"]: r for r in bpe_train_encode(single, 4).collect()}
    assert out[1]["n_words"] == 4 and out[1]["n_bpe_tokens"] == 4
    assert out[2]["n_bpe_tokens"] == 1

    tiny = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    learned = bpe_train(tiny, n_merges=99)
    assert learned == [("a", "b", 2)]  # early stop after the only pair
    out = bpe_train_encode(tiny, 99).collect()[0]
    assert out["n_words"] == 2 and out["n_bpe_tokens"] == 2
    assert out["max_token"] == "ab"
