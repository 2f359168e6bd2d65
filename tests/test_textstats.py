"""Text-analysis operator tests on hand-computable documents."""

from __future__ import annotations

from pysparkflow.functions.text import edge_id, shingles, token_count
from pysparkflow.llmops.textstats import (
    language_scores,
    quality_features,
    rolling_fingerprints,
)



def test_token_count_and_shingles(spark):
    df = spark.createDataFrame([(1, "  a b  c d ")], "id long, text string")
    row = df.select(
        token_count("text").alias("n"), shingles("text", 2).alias("sh")
    ).collect()[0]
    assert row["n"] == 4
    assert row["sh"] == ["a b", "b c", "c d"]


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "a b")], "id long, text string")
    assert df.select(shingles("text", 3).alias("s")).collect()[0]["s"] == []


def test_edge_id_packing(spark):
    df = spark.createDataFrame([(7, 3)], "a long, b long")
    got = df.select(edge_id("a", "b").alias("e")).collect()[0]["e"]
    assert got == 3 * 4294967296 + 7  # least in the high word


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog, of 12 mice!")], "doc_id long, text string"
    )
    row = quality_features(df).collect()[0]
    assert row["n_chars"] == 32
    assert row["n_tokens"] == 8
    # markers: ' the ' x1 (leading 'the' unpadded doesn't count), ' and ' x1, ' of ' x1
    assert row["stopword_ratio"] == round(3 / 8, 4)
    assert row["punct_ratio"] == round(2 / 32, 4)
    assert row["digit_ratio"] == round(2 / 32, 4)


def test_language_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "x the y and z of w"),
            (2, "x der y und z das w"),
            (3, "x le y et z les w"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r["lang_pred"] for r in language_scores(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr"}


def test_rolling_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b")], "doc_id long, text string"
    )
    got = {r["id"]: r["fingerprints"] for r in rolling_fingerprints(df, window=8).collect()}
    assert 1 <= len(got[1]) <= 3  # 10 tokens, window 8 → 3 windows, minima dedup'd
    assert len(got[2]) == 1  # short doc → single global min


def test_fingerprints_shift_invariant_overlap(spark):
    """Winnowing property: a doc and the same doc with one word prepended
    share most fingerprints."""
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    df = spark.createDataFrame(
        [(1, base), (2, "zzz " + base)], "doc_id long, text string"
    )
    got = {r["id"]: set(r["fingerprints"]) for r in rolling_fingerprints(df).collect()}
    overlap = len(got[1] & got[2]) / len(got[1] | got[2])
    assert overlap >= 0.5


def test_portable_hash32_matches_oracle_engines(spark):
    """The md5-word hash must agree byte-for-byte with hashlib (which the
    winnowing mapInPandas uses) and with DuckDB's hex-parse form."""
    import hashlib

    import duckdb

    from pysparkflow.functions.text import portable_hash32

    words = ["hello", "", "a b", "ünïcode", "42"]
    df = spark.createDataFrame([(w,) for w in words], "t string")
    got = {
        r["t"]: (r["h0"], r["h1"])
        for r in df.select(
            "t",
            portable_hash32("t", word=0).alias("h0"),
            portable_hash32("t", word=1).alias("h1"),
        ).collect()
    }
    for w in words:
        d = hashlib.md5(w.encode()).digest()
        assert got[w][0] == int.from_bytes(d[:4], "big")
        assert got[w][1] == int.from_bytes(d[4:8], "big")
        duck = duckdb.sql(
            "SELECT ('0x' || substr(md5(?), 1, 8))::BIGINT,"
            "       ('0x' || substr(md5(?), 9, 8))::BIGINT",
            params=[w, w],
        ).fetchone()
        assert got[w] == duck


def test_rolling_fingerprints_null_and_empty_text(spark):
    """NULL / empty / whitespace-only text yields an empty sketch instead
    of crashing the Arrow batch (malformed-input tolerance)."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "a b c")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["fingerprints"] for r in rolling_fingerprints(df).collect()}
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert len(got[4]) >= 1


def test_repetition_features_known_values(spark):
    from pysparkflow.llmops.textstats import repetition_features

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # 2-grams: ab ba ab ba ab -> 5 total, 2 distinct
            (2, "x y z w"),            # no repetition
            (3, "spam spam spam spam"),  # one token repeated
            (4, "solo"),               # < 2 tokens -> zero fractions
        ],
        "doc_id long, text string",
    )
    got = {r.id: r for r in repetition_features(df).collect()}
    assert got[1].dup_2gram_frac == round(3 / 5, 6)
    assert got[1].top_word_frac == 0.5
    assert got[2].dup_2gram_frac == 0.0 and got[2].dup_3gram_frac == 0.0
    assert got[2].top_word_frac == 0.25
    assert got[3].dup_2gram_frac == round(2 / 3, 6)
    assert got[3].top_word_frac == 1.0
    assert got[4].dup_2gram_frac == 0.0 and got[4].top_word_frac == 1.0
