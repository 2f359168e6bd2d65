"""Round-5b operator units: Z-order keys, BPE pair statistics,
binaryFile ingest, MAD outliers, A-Res weighted sampling.

Hand-computed expectations on tiny constructed inputs; the sf0.01
DuckDB-oracle entries (zorder_layout, bpe_merge_candidates,
binaryfile_ingest, mad_anomaly, weighted_sample, session_paths) cover
the same operators at corpus shape.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pysparkflow.io.binaryfiles import binary_files_to_table
from pysparkflow.llmops.bpe import pair_counts, top_merge_candidates, word_frequencies
from pysparkflow.llmops.multimodal import decode_stats_from_bytes, synth_ppm
from pysparkflow.llmops.sampling import weighted_sample_wor
from pysparkflow.operators.timeseries import mad_outliers
from pysparkflow.operators.zorder import interleave_bits, zorder_key


# --- zorder -----------------------------------------------------------


def test_interleave_bits_known_values(spark):
    # a=0b101, b=0b011 -> z bits: a0=1,b0=1,a1=0,b1=1,a2=1,b2=0
    # z = 1 + 2 + 0 + 8 + 16 + 0 = 27
    df = spark.createDataFrame([(5, 3)], "a int, b int")
    out = df.select(
        interleave_bits(F.col("a"), F.col("b"), 3).alias("z")
    ).collect()
    assert out[0]["z"] == 27


def test_zorder_key_locality(spark):
    # 16 points on a 4x4 grid of distinct values: each z cell holds
    # exactly one row, and nearby values share z prefixes
    rows = [(float(i), float(j)) for i in range(4) for j in range(4)]
    df = spark.createDataFrame(rows, "x double, y double")
    z = zorder_key(df, "x", "y", bits=2)
    got = {(r["x"], r["y"]): r["z"] for r in z.collect()}
    assert len(set(got.values())) == 16  # distinct cells
    # corner checks: smallest values -> bucket 0 -> z 0;
    # largest -> bucket 3 on both dims -> z = 0b1111 = 15
    assert got[(0.0, 0.0)] == 0
    assert got[(3.0, 3.0)] == 15


# --- bpe --------------------------------------------------------------


def test_bpe_pair_counts_weighted(spark):
    docs = spark.createDataFrame(
        [(1, "aba aba ab"), (2, "ab")], "doc_id long, text string"
    )
    # words: aba x2 (pairs ab, ba each x2), ab x2 (pair ab x2)
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert wf == {"aba": 2, "ab": 2}
    pc = {
        (r["lhs"], r["rhs"]): r["n"]
        for r in pair_counts(word_frequencies(docs)).collect()
    }
    assert pc == {("a", "b"): 4, ("b", "a"): 2}


def test_bpe_top_candidates_rank_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "xy xz xy")], "doc_id long, text string"
    )
    out = top_merge_candidates(docs, k=3).collect()
    assert [(r["lhs"], r["rhs"], r["n"], r["rank"]) for r in out] == [
        ("x", "y", 2, 1),
        ("x", "z", 1, 2),
    ]


# --- binaryfiles ------------------------------------------------------


def test_binary_files_roundtrip_and_decode(spark, tmp_path):
    ids = [0, 7, 21]
    for did in ids:
        (tmp_path / f"img_{did:06d}.ppm").write_bytes(synth_ppm(did))
    (tmp_path / "ignore.txt").write_text("not media")
    tbl = binary_files_to_table(spark, str(tmp_path), "*.ppm")
    rows = {r["media_id"]: r for r in tbl.collect()}
    assert set(rows) == set(ids)  # glob pushdown excluded the .txt
    for did in ids:
        assert bytes(rows[did]["content"]) == synth_ppm(did)
        assert rows[did]["n_bytes"] == len(synth_ppm(did))
    stats = {
        r["media_id"]: r
        for r in decode_stats_from_bytes(tbl, id_col="media_id").collect()
    }
    # closed-form raster: w = 16 + id%8, h = 8 + id%5
    for did in ids:
        assert stats[did]["width"] == 16 + did % 8
        assert stats[did]["height"] == 8 + did % 5
        assert stats[did]["channels"] == 3
        assert stats[did]["tl_px"] == (did * 7) % 256


# --- mad_outliers -----------------------------------------------------


def test_mad_outliers_robust_to_own_outlier(spark):
    # 1..21 plus one huge value; median 11.5ish, MAD small, the huge
    # value flags; a stddev-based z-score at the same threshold would
    # be dragged by the outlier itself
    vals = [float(v) for v in range(1, 22)] + [10000.0]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, g string, v double"
    )
    out = mad_outliers(df, "g", "v", threshold=3.5).collect()
    assert [r["id"] for r in out] == [21]
    assert out[0]["dev"] > 3.5


def test_mad_outliers_degenerate_mad_zero(spark):
    # >50% identical values -> MAD 0 -> any deviation flags, dev NULL
    vals = [5.0] * 6 + [5.1, 4.9]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, g string, v double"
    )
    out = mad_outliers(df, "g", "v", threshold=3.5).collect()
    assert sorted(r["v"] for r in out) == [4.9, 5.1]
    assert all(r["dev"] is None for r in out)


# --- weighted_sample_wor ---------------------------------------------


def test_weighted_sample_wor_properties(spark):
    rows = [(i, float(1 + i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample_wor(df, 50, "w")
    sel = [r["doc_id"] for r in got.collect()]
    assert len(sel) == 50 and len(set(sel)) == 50  # without replacement
    # determinism across layouts
    sel2 = [
        r["doc_id"]
        for r in weighted_sample_wor(df.repartition(7), 50, "w").collect()
    ]
    assert set(sel) == set(sel2)
    # weight-proportionality: mean weight of the sample must exceed the
    # population mean (higher weights win more often)
    wmap = dict(rows)
    pop_mean = sum(wmap.values()) / len(wmap)
    samp_mean = sum(wmap[i] for i in sel) / len(sel)
    assert samp_mean > pop_mean


def test_weighted_sample_wor_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 2.0)], "doc_id long, w double"
    )
    sel = [r["doc_id"] for r in weighted_sample_wor(df, 10, "w").collect()]
    assert sel == [3]
