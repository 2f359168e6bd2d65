"""Round-5 operator units: URL canonicalization dedup, blocked
edit-distance join, time-series (gap fill / range window / z-score),
unigram LM scoring, chunking, ORC roundtrip.

Each test pins hand-computed expectations on tiny constructed inputs;
the sf0.01 DuckDB-oracle entries in relational/registry.py cover the
same operators at corpus shape.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pysparkflow.io.orc import orc_roundtrip
from pysparkflow.llmops.chunking import chunk_documents
from pysparkflow.llmops.lm_score import unigram_lm_scores
from pysparkflow.llmops.urltools import canonicalize_url, url_dup_groups
from pysparkflow.operators.simjoin import edit_distance_pairs
from pysparkflow.operators.timeseries import (
    gap_fill_hourly,
    rolling_range_sum,
    zscore_outliers,
)


# --- urltools ---------------------------------------------------------


CANON_CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM/a/", "https://example.com/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a?utm_source=x&id=1", "https://example.com/a?id=1"),
    ("https://example.com/a?id=1&utm_campaign=y", "https://example.com/a?id=1"),
    ("https://example.com/a/?id=1", "https://example.com/a?id=1"),
    ("https://example.com/a?id=1", "https://example.com/a?id=1"),
    ("http://www.example.com", "http://example.com"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CANON_CASES)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"{raw!r}: got {got[i]!r}, want {want!r}"


def test_url_dup_groups_keeps_min_id(spark):
    rows = [
        (1, "https://www.a.com/x/"),
        (2, "HTTPS://A.COM/x"),
        (3, "https://a.com/x?utm_source=s"),
        (4, "https://b.com/only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dup_groups(df, "url", "doc_id").collect()
    assert len(out) == 1
    assert out[0]["canonical_url"] == "https://a.com/x"
    assert out[0]["n_dups"] == 3
    assert out[0]["min_id"] == 1


# --- simjoin ----------------------------------------------------------


def test_edit_distance_pairs_planted(spark):
    vals = [
        "chocolate lime",   # dist 1 from "chocolate lima" (same 4-suffix? no)
        "almond khaki rose",
        "almond khaki ross",  # dist 2 from above but suffix differs
        "peach pale rose",
        "peach pale rose",    # exact dup collapses in vocab
        "peach palk rose",    # dist 1, same suffix "rose"
        "unrelated thing",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    out = edit_distance_pairs(df, "s", max_dist=2, suffix_len=4).collect()
    pairs = {(r["a"], r["b"]): r["dist"] for r in out}
    # both *rose values share suffix "rose" and are 1 edit apart
    assert pairs[("peach pale rose", "peach palk rose")] == 1
    # nothing pairs with itself and a < b always
    for a, b in pairs:
        assert a < b
    # vocab dedup: exact dup contributes no (x, x) pair
    assert ("peach pale rose", "peach pale rose") not in pairs


def test_edit_distance_length_band_is_lossless(spark):
    # strings differing by > max_dist in length can never be within
    # max_dist edits, so the band filter removes no true pair
    df = spark.createDataFrame(
        [("rose",), ("primrose",)], "s string"
    )  # same suffix, length gap 4 > max_dist 2
    out = edit_distance_pairs(df, "s", max_dist=2, suffix_len=4).collect()
    assert out == []


# --- timeseries -------------------------------------------------------


def test_gap_fill_hourly_fills_zeros(spark):
    rows = [
        (1, "2024-01-01 00:10:00", 2.0),
        (1, "2024-01-01 03:20:00", 4.0),  # hours 1, 2 missing
        (2, "2024-01-01 05:00:00", 1.0),  # single-hour span
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "value"
    )
    out = gap_fill_hourly(ev)
    got = {
        (r["user_id"], str(r["hour"])): (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    assert len(got) == 5  # user 1: hours 0-3 (4 rows), user 2: 1 row
    assert got[(1, "2024-01-01 01:00:00")] == (0, 0.0)
    assert got[(1, "2024-01-01 02:00:00")] == (0, 0.0)
    assert got[(1, "2024-01-01 00:00:00")] == (1, 2.0)
    assert got[(2, "2024-01-01 05:00:00")] == (1, 1.0)


def test_rolling_range_sum_interval_semantics(spark):
    # rows 31 days apart must NOT see each other; same-day rows must
    rows = [
        (1, 10, "2024-01-01 00:00:00", 5.0),
        (1, 11, "2024-01-15 00:00:00", 7.0),   # sees row 10 (14d back)
        (1, 12, "2024-02-05 00:00:00", 1.0),   # sees row 11 (21d), not row 10 (35d)
        (2, 20, "2024-01-01 00:00:00", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "k long, id long, ts string, v double"
    ).select("k", "id", F.col("ts").cast("timestamp_ntz").alias("ts"), "v")
    out = rolling_range_sum(df, "k", "ts", "v", days=30)
    got = {r["id"]: r["rolling_sum"] for r in out.collect()}
    assert got[10] == 5.0
    assert got[11] == 12.0
    assert got[12] == 8.0
    assert got[20] == 3.0


def test_zscore_outliers_flags_only_extremes(spark):
    vals = [10.0] * 20 + [10.5] * 20 + [1000.0]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, g string, v double"
    )
    out = zscore_outliers(df, "g", "v", threshold=3.0).collect()
    assert [r["id"] for r in out] == [40]
    assert out[0]["z"] > 3.0


# --- lm_score ---------------------------------------------------------


def test_unigram_lm_scores_hand_computed(spark):
    # corpus: doc 1 = "a a b", doc 2 = "b c"
    # counts: a=2 b=2 c=1, total=5 → lp(a)=lp(b)=ln(0.4), lp(c)=ln(0.2)
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unigram_lm_scores(docs).collect()}
    lp_ab, lp_c = math.log(0.4), math.log(0.2)
    assert got[1]["n_tokens"] == 3
    assert got[1]["lm_score"] == pytest.approx(round(lp_ab, 4), abs=1e-9)
    assert got[2]["n_tokens"] == 2
    assert got[2]["lm_score"] == pytest.approx(
        round((lp_ab + lp_c) / 2, 4), abs=1e-9
    )


# --- chunking ---------------------------------------------------------


def test_chunk_documents_boundaries(spark):
    text = "x" * 350  # size=200 stride=150 → chunks at 0 (200), 150 (200), 300 (50)
    docs = spark.createDataFrame(
        [(1, text), (2, "short"), (3, "")], "doc_id long, text string"
    )
    out = chunk_documents(docs, size=200, stride=150).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_len"]))
    assert sorted(by_doc[1]) == [(0, 200), (1, 200), (2, 50)]
    assert by_doc[2] == [(0, 5)]
    assert 3 not in by_doc  # empty docs produce no chunks
    # overlapping windows over identical chars share fingerprints
    md5s = {r["chunk_md5"] for r in out if r["doc_id"] == 1 and r["chunk_len"] == 200}
    assert len(md5s) == 1


def test_chunk_documents_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, size=0, stride=10)
    with pytest.raises(ValueError):
        chunk_documents(docs, size=10, stride=0)


# --- orc --------------------------------------------------------------


def test_orc_roundtrip_fidelity(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "hello", 1.5, [0.1, 0.2]), (2, None, -2.0, [])],
        "id long, s string, v double, arr array<double>",
    )
    back = orc_roundtrip(df, str(tmp_path / "orc"))
    assert back.schema == df.schema
    a = sorted(df.collect(), key=lambda r: r["id"])
    b = sorted(back.collect(), key=lambda r: r["id"])
    assert a == b
