"""Unit tests for the round-4 curation additions: PII/blocklist
scrubbing, TF-IDF salient terms, span-level dedup, temperature mixture
sampling, and the checkpointed streaming parquet sink."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pysparkflow.llmops.dedup import span_dedup
from pysparkflow.llmops.sampling import temperature_mixture
from pysparkflow.llmops.scrub import scrub_blocklist, scrub_text
from pysparkflow.llmops.tfidf import source_salient_terms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ---------------------------------------------------------------- scrub


def test_scrub_pii_families(spark):
    df = _docs(
        spark,
        [
            (1, "s", "mail me at jane.doe+x@example.co.uk today"),
            (2, "s", "call +1-212-555-1234 or 212.555.9999"),
            (3, "s", "server at 10.0.0.1 port open"),
            (4, "s", "account 123456789012 flagged"),
            (5, "s", "nothing sensitive here"),
        ],
    )
    out = {r["doc_id"]: r for r in scrub_text(df).collect()}
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["text_clean"]
    assert "jane" not in out[1]["text_clean"]
    assert out[2]["n_phone"] == 2 and out[2]["text_clean"].count("<PHONE>") == 2
    assert out[3]["n_ipv4"] == 1 and "<IP>" in out[3]["text_clean"]
    assert out[4]["n_id_number"] == 1 and "<ID>" in out[4]["text_clean"]
    assert out[5]["text_clean"] == "nothing sensitive here"
    assert all(out[5][f"n_{f}"] == 0 for f in ("email", "phone", "ipv4", "id_number"))


def test_scrub_counts_taken_before_replacement(spark):
    # the email's digits-in-domain must not be double-counted as an id
    # after replacement; counts are all against the original text
    df = _docs(spark, [(1, "s", "x 999888777 and a@b.com end")])
    r = scrub_text(df).collect()[0]
    assert r["n_email"] == 1 and r["n_id_number"] == 1
    assert r["text_clean"] == "x <ID> and <EMAIL> end"


def test_scrub_blocklist_whole_words(spark):
    df = _docs(spark, [(1, "s", "spark sparkly spark customer accustomed")])
    r = scrub_blocklist(df, ["spark", "customer"]).collect()[0]
    # whole words only: "sparkly"/"accustomed" untouched
    assert r["n_blocked"] == 3
    assert r["text_clean"] == "<BLOCKED> sparkly <BLOCKED> <BLOCKED> accustomed"


# ---------------------------------------------------------------- tfidf


def test_tfidf_salient_terms(spark):
    df = _docs(
        spark,
        [
            (1, "a", "apple apple banana"),
            (2, "a", "apple cherry"),
            (3, "b", "banana banana cherry"),
            (4, "b", "durian"),
        ],
    )
    out = source_salient_terms(df, top_k=1).collect()
    by_src = {r["source"]: r for r in out}
    # source a: apple tf=3, idf=ln(4/2); beats banana/cherry
    assert by_src["a"]["term"] == "apple"
    assert by_src["a"]["tf"] == 3
    assert by_src["a"]["score"] == round(3 * math.log(4 / 2), 6)
    # source b: durian tf=1 idf=ln(4) vs banana tf=2 idf=ln(2) — banana wins
    assert by_src["b"]["term"] == "banana"
    assert by_src["b"]["rank"] == 1


# ---------------------------------------------------------------- span dedup


def test_span_dedup_drops_repeated_spans(spark):
    boiler = " ".join(f"b{i}" for i in range(16))
    uniq1 = " ".join(f"u{i}" for i in range(16))
    uniq2 = " ".join(f"v{i}" for i in range(16))
    df = _docs(
        spark,
        [
            (1, "s", f"{boiler} {uniq1}"),
            (2, "s", f"{boiler} {uniq2}"),
        ],
    )
    out = {r["id"]: r for r in span_dedup(df, chunk_words=16).collect()}
    # doc 1 owns the first occurrence of the boilerplate span
    assert out[1]["text_clean"] == f"{boiler} {uniq1}"
    assert out[1]["n_dropped"] == 0
    # doc 2 loses it, keeps its unique span, order preserved
    assert out[2]["text_clean"] == uniq2
    assert out[2]["n_spans"] == 2 and out[2]["n_dropped"] == 1


def test_span_dedup_within_one_doc(spark):
    span = " ".join(f"w{i}" for i in range(16))
    df = _docs(spark, [(1, "s", f"{span} {span}")])
    r = span_dedup(df, chunk_words=16).collect()[0]
    assert r["text_clean"] == span
    assert r["n_spans"] == 2 and r["n_dropped"] == 1


def test_span_dedup_short_doc_is_identity(spark):
    df = _docs(spark, [(1, "s", "just a few words")])
    r = span_dedup(df, chunk_words=16).collect()[0]
    assert r["text_clean"] == "just a few words"
    assert r["n_spans"] == 1 and r["n_dropped"] == 0


def test_span_dedup_splits_text_once_per_doc(spark):
    """r13 opt pin: the span generator reads a PROJECTED words array
    (one split per document). With the split inlined in the transform
    lambda, the interpreted higher-order function re-tokenized the full
    text once per SPAN — O(words^2/chunk) per doc (measured 20.3s vs
    0.9s on 2000 x 3000-word docs). The plan must carry exactly one
    split(...) under the generate, and results must match the naive
    expression on a multi-span doc with irregular whitespace."""
    words = [f"w{i % 7}" for i in range(100)]
    text = "  " + "  ".join(words) + " "
    df = _docs(spark, [(1, "s", text), (2, "s", " ".join(words[:50]))])
    out = span_dedup(df, chunk_words=16)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    import re

    assert len(re.findall(r"\bsplit\(trim", plan)) == 1, plan
    got = {r["id"]: r for r in out.collect()}
    # naive reference: spans of the python-split word list
    for doc_id, t in ((1, text), (2, " ".join(words[:50]))):
        ws = t.strip().split()
        spans = [
            " ".join(ws[i : i + 16]) for i in range(0, len(ws), 16)
        ]
        assert got[doc_id]["n_spans"] == len(spans)
    # doc 1 contains every doc-2 span pattern? no — just check doc 2's
    # surviving text equals first-occurrence reassembly across the corpus
    seen: set = set()
    for doc_id in (1, 2):
        ws = (text if doc_id == 1 else " ".join(words[:50])).strip().split()
        spans = [" ".join(ws[i : i + 16]) for i in range(0, len(ws), 16)]
        keep = []
        for s in spans:
            if s not in seen:
                keep.append(s)
                seen.add(s)
        assert got[doc_id]["text_clean"] == " ".join(keep), doc_id


# ---------------------------------------------------------------- mixture


def test_temperature_mixture_flattens_head(spark):
    rows = [(i, "big", f"doc {i}") for i in range(900)]
    rows += [(1000 + i, "small", f"doc {1000 + i}") for i in range(100)]
    df = _docs(spark, rows)
    out = temperature_mixture(df, target_frac=0.5, seed=7)
    picked = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in picked}
    # sqrt flattening: allocation ratio 3:1 instead of 9:1; the small
    # group's rate rises vs uniform 0.5, the big group's falls
    big_rate = by.get("big", 0) / 900
    small_rate = by.get("small", 0) / 100
    assert small_rate > 0.55
    assert big_rate < 0.5
    # ~half the corpus selected overall (hash-quantized, so approximate)
    total = sum(by.values())
    assert 400 <= total <= 600


def test_temperature_mixture_small_group_kept_whole(spark):
    # a group tiny vs its allocation gets rate 1.0: every row kept
    rows = [(i, "huge", "x") for i in range(2000)] + [(9000 + i, "tiny", "y") for i in range(3)]
    df = _docs(spark, rows)
    out = temperature_mixture(df, target_frac=0.5, seed=7)
    assert out.where(F.col("source") == "tiny").count() == 3


def test_temperature_mixture_partition_invariant(spark):
    rows = [(i, f"s{i % 3}", f"doc {i}") for i in range(300)]
    df = _docs(spark, rows)
    a = sorted(r["doc_id"] for r in temperature_mixture(df).collect())
    b = sorted(
        r["doc_id"] for r in temperature_mixture(df.repartition(13)).collect()
    )
    assert a == b


# ---------------------------------------------------------------- sink


def test_stream_to_parquet_checkpoint_exactly_once(spark, tmp_path):
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", src / "events.parquet"
    )
    from pysparkflow.streaming.events import run_stream_to_parquet

    first = run_stream_to_parquet(
        spark, f"{src}/*.parquet", out, ckpt
    ).count()
    n_src = spark.read.parquet(f"{src}/events.parquet").count()
    assert first == n_src
    # restart over a grown directory: only the new file lands — no
    # reprocessing of the committed one (checkpointed source offsets)
    extra = spark.read.parquet(f"{src}/events.parquet").limit(37)
    extra.write.parquet(str(tmp_path / "extra"))
    for f in (tmp_path / "extra").glob("*.parquet"):
        shutil.copy(f, src / "more.parquet")
    second = run_stream_to_parquet(spark, f"{src}/*.parquet", out, ckpt)
    assert second.count() == n_src + 37
