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


def test_misra_gries_exact_under_capacity(spark):
    """Distinct keys <= k_track: no decrement ever fires and the
    estimates ARE the exact counts."""
    from pysparkflow.operators.approxtopk import misra_gries_topk

    rows = [(i % 10,) for i in range(1000)] + [(3,)] * 500
    df = spark.createDataFrame(rows, "k long")
    out = {r.k: r.count_est for r in misra_gries_topk(df, "k", k_track=16, top_n=10).collect()}
    assert out[3] == 600
    assert all(out[k] == 100 for k in out if k != 3)


def test_misra_gries_lossy_band_and_coverage(spark):
    """k_track far below the key cardinality: every estimate must obey
    true - n/(k_track+1) <= est <= true, and a planted dominant key
    must survive the decrements and rank first."""
    from pysparkflow.operators.approxtopk import misra_gries_topk

    # 4000 singleton keys + one key with 800 occurrences, shuffled
    # deterministically across 8 partitions
    rows = [(1_000_000,)] * 800 + [(i,) for i in range(4000)]
    df = spark.createDataFrame(rows, "k long").repartition(8, "k")
    n = len(rows)
    k_track = 32
    got = misra_gries_topk(df, "k", k_track=k_track, top_n=3).collect()
    exact = {1_000_000: 800, **{i: 1 for i in range(4000)}}
    bound = n // (k_track + 1)
    for r in got:
        true = exact[r.k]
        assert true - bound <= r.count_est <= true, (r, true, bound)
    assert got[0].k == 1_000_000 and got[0].count_est >= 800 - bound


def test_misra_gries_merge_invariance(spark):
    """The guarantee must hold regardless of partitioning: 1 partition
    vs 16 partitions both band-contain the truth for the heavy key."""
    from pysparkflow.operators.approxtopk import misra_gries_topk

    rows = [(7,)] * 300 + [(i + 100,) for i in range(2000)] * 2
    bound = len(rows) // 17
    for parts in (1, 16):
        df = spark.createDataFrame(rows, "k long").repartition(parts)
        top = misra_gries_topk(df, "k", k_track=16, top_n=1).collect()[0]
        assert top.k == 7 and 300 - bound <= top.count_est <= 300


def test_synth_wav_roundtrip_and_spectral(spark):
    """synth -> RIFF parse -> FFT recovers the generating tones for a
    spread of ids, and the bin->Hz arithmetic stays integer."""
    import numpy as np

    from pysparkflow.llmops.multimodal import (
        audio_spectral,
        decode_media,
        synth_wav,
    )

    for did in (0, 3, 17, 94, 95, 96, 1001):
        modality, (samples, sr) = decode_media(synth_wav(did))
        assert modality == "audio" and sr == 8000
        assert samples.shape == (1000, 1)
        mag = np.abs(np.fft.rfft(samples[:, 0].astype(np.float64)))
        assert int(np.argmax(mag)) == 32 + did % 96

    ids = spark.createDataFrame([(d,) for d in (3, 10, 24, 150)], "doc_id long")
    out = {r.media_id: r for r in audio_spectral(ids).collect()}
    for did in (3, 10, 24, 150):
        r = out[did]
        assert r.peak_bin == 32 + did % 96
        assert r.second_bin == 16 + did % 13
        assert r.dominant_hz == (32 + did % 96) * 8
        assert (r.sample_rate, r.n_samples) == (8000, 1000)


def test_bloom_join_string_keys(spark):
    """Keys hash at their own type: string keys (URLs/tokens — the
    canonical case) must work end-to-end, malformed numerics included."""
    fact = spark.createDataFrame(
        [("a5", 1), ("7", 2), ("zzz", 3), ("a5", 4)], "k string, v int"
    )
    dim = spark.createDataFrame([("a5", "x"), ("nope", "y")], "dk string, label string")
    got = (
        bloom_prefiltered_join(fact, dim, "k", "dk")
        .select("v", "label")
        .orderBy("v")
        .collect()
    )
    assert [(r.v, r.label) for r in got] == [(1, "x"), (4, "x")]


def test_bloom_join_mismatched_key_types_raises(spark):
    """xxhash64 is type-sensitive (int 7 != bigint 7): silently dropping
    true matches is the one failure a superset gate must never have, so
    mismatched key types are an explicit error."""
    import pytest

    fact = spark.createDataFrame([(7,)], "k int")
    dim = spark.createDataFrame([(7,)], "dk long")
    with pytest.raises(ValueError, match="matching key types"):
        bloom_prefiltered_join(fact, dim, "k", "dk")


def test_misra_gries_string_keys(spark):
    from pysparkflow.operators.approxtopk import misra_gries_topk

    rows = [("the",)] * 50 + [("and",)] * 30 + [(f"w{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "tok string")
    got = misra_gries_topk(df, "tok", k_track=16, top_n=2).collect()
    bound = len(rows) // 17
    assert [r.tok for r in got] == ["the", "and"]
    assert 50 - bound <= got[0].count_est <= 50
    assert 30 - bound <= got[1].count_est <= 30


def test_select_cluster_representatives_unscored_member(spark):
    """A clustered doc missing from the score table stays in the rewrite
    mapping (left join) and never wins the election (nulls last)."""
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, keep_id long"
    )
    scored = spark.createDataFrame([(1, 0.4), (3, 0.2)], "id long, q_score double")
    out = {
        r.doc_id: (r.best_id, r.score, r.best_score)
        for r in select_cluster_representatives(clusters, scored).collect()
    }
    assert len(out) == 3
    assert out[2] == (1, None, 0.4)  # unscored: present, not elected
    assert out[1] == (1, 0.4, 0.4) and out[3] == (1, 0.2, 0.4)


def test_psi_drift_null_values_excluded_from_totals(spark):
    """NULL feature values have no bin; counting them into the totals
    while their mass never reaches the scaffold would deflate every
    bin's probability (the counted-but-unbinned leak, ADVICE-r7 class).
    PSI over a corpus with planted nulls must equal PSI over the
    null-free subset."""
    from pysparkflow.llmops.drift import psi_drift

    base = [("a", float(10 * i % 400), i) for i in range(400)]
    clean = spark.createDataFrame(base, "event_type string, value double, event_id long")
    with_nulls = clean.unionByName(
        spark.createDataFrame(
            [("a", None, 9001), ("a", None, 9002)],
            "event_type string, value double, event_id long",
        )
    )
    snap = F.col("event_id") % 2 == 1
    want = psi_drift(clean, snap).collect()
    got = psi_drift(with_nulls, snap).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got[0].n_ref + got[0].n_cur == 400


def test_rawvideo_container_roundtrip_and_sampling(spark):
    """RVID walk + per-frame PNM decode inverts the synth formula, and
    stride sampling keeps exactly frames 0, s, 2s, ..."""
    import numpy as np

    from pysparkflow.llmops.multimodal import (
        _parse_rawvideo,
        synth_rawvideo,
        video_frame_stats,
    )

    for did in (0, 5, 12, 33):
        frames = _parse_rawvideo(synth_rawvideo(did))
        assert len(frames) == 4 + did % 5
        w, h = 16 + did % 8, 8 + did % 5
        for f, arr in enumerate(frames):
            assert arr.shape == (h, w, 3)
            x = np.arange(w)[None, :, None]
            y = np.arange(h)[:, None, None]
            c = np.arange(3)[None, None, :]
            want = (did * 7 + f * 17 + x * 3 + y * 5 + c * 11) % 256
            assert (arr == want).all()

    ids = spark.createDataFrame([(5,), (12,)], "doc_id long")
    out = video_frame_stats(ids, stride=3).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    assert sorted(by_id[5]) == [0, 3]  # nf = 4 + 5%5 = 4 -> frames 0,3
    assert sorted(by_id[12]) == [0, 3]  # nf = 6 -> range(0,6,3) = 0,3
    for r in out:
        assert r.n_frames == 4 + r.media_id % 5
        assert (r.width, r.height) == (16 + r.media_id % 8, 8 + r.media_id % 5)
