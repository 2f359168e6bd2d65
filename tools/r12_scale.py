"""Round-12 scale evidence with planted truth (SCALING.md): BPE
tokenizer APPLICATION — encode_words / bpe_document_tokens /
bpe_token_budget (llmops/bpe.py, VERDICT r11 #3).

Check 1 (corpus-scale accounting, default 2,000,000 documents, tiny
vocab): doc i's text is a Catalyst-generated mix with closed-form
encoded lengths under DEFAULT_MERGES —
    (i % 7) x "interesting"  -> 6 tokens each (in,t,er,e,st,ing)
    (i % 3) x "thermometer"  -> 8 tokens each (the,r,m,o,m,e,t,er)
    1+(i % 5) x "the"        -> 1 token each
so n_bpe_tokens = 6a + 8b + c and n_words = a + b + c exactly, and
max_token = 'the' for every doc (lexicographic max of all tokens
present). This is the 100 TB shape the operator claims: the corpus
side is word-keyed only and the Python encode runs on the DISTINCT
vocabulary — three words here, regardless of corpus rows.

Check 2 (vocab-scale kernel, default 1,000,000 DISTINCT words): word i
is conv(i, 10, 5) translated onto the alphabet {b,c,f,j,k} — NO
DEFAULT_MERGES pair exists inside that alphabet, so the encoding is
the character split and n_tokens = length(word); every even id gets a
'the' suffix, whose t+h and th+e merges fire at the word boundary for
exactly +1 token. Pins the Arrow kernel itself at a vocabulary three
orders beyond the graded corpora, with the merge loop exercised on
half the rows.

Check 3 (budget integer arithmetic, default 200 sources x 500 docs):
source s holds docs of exactly c = 1..L tokens ("the " repeated — each
'the' is one token). The operator keeps the longest-first prefix while
100*cum <= 60*total with cum_j = j(2L-j+1)/2 and total = L(L+1)/2, so
the kept count j* and the minimum kept length L-j*+1 are closed-form
per source; all sources must agree exactly.

Usage: python tools/r12_scale.py [n_docs] [n_words]
(defaults 2_000_000 1_000_000; smoke: python tools/r12_scale.py 40000 20000)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def check1_corpus_accounting(spark, n_docs: int) -> None:
    from pysparkflow.llmops.bpe import DEFAULT_MERGES, bpe_document_tokens

    t0 = time.time()
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).alias("a"),
            (F.col("id") % 3).alias("b"),
            (F.col("id") % 5 + 1).alias("c"),
        )
        .select(
            "doc_id",
            F.concat(
                F.repeat(F.lit("interesting "), F.col("a").cast("int")),
                F.repeat(F.lit("thermometer "), F.col("b").cast("int")),
                F.repeat(F.lit("the "), F.col("c").cast("int")),
            ).alias("text"),
            (F.col("a") + F.col("b") + F.col("c")).alias("exp_words"),
            (6 * F.col("a") + 8 * F.col("b") + F.col("c")).alias("exp_toks"),
        )
    )
    out = bpe_document_tokens(docs, DEFAULT_MERGES)
    joined = out.join(
        docs.select("doc_id", "exp_words", "exp_toks"),
        out["id"] == F.col("doc_id"),
    )
    bad = joined.where(
        (F.col("n_words") != F.col("exp_words"))
        | (F.col("n_bpe_tokens") != F.col("exp_toks"))
        | (F.col("max_token") != F.lit("the"))
    ).count()
    total = out.count()
    assert total == n_docs, (total, n_docs)
    assert bad == 0, f"{bad} documents off the closed form"
    print(
        f"check1 OK: {n_docs} docs, every (n_words, n_bpe_tokens, "
        f"max_token) exact ({time.time() - t0:.1f}s)"
    )


def check2_vocab_kernel(spark, n_words: int) -> None:
    from pysparkflow.llmops.bpe import DEFAULT_MERGES, encode_words

    t0 = time.time()
    words = spark.range(n_words).select(
        F.concat(
            F.translate(F.conv(F.col("id"), 10, 5), "01234", "bcfjk"),
            F.when(F.col("id") % 2 == 0, F.lit("the")).otherwise(F.lit("")),
        ).alias("word"),
        (
            F.length(F.conv(F.col("id"), 10, 5))
            + F.when(F.col("id") % 2 == 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("exp_toks"),
    )
    enc = encode_words(words, DEFAULT_MERGES)
    bad = enc.where(F.col("n_tokens") != F.col("exp_toks")).count()
    total = enc.count()
    assert total == n_words, (total, n_words)
    assert bad == 0, f"{bad} words off the closed form"
    # identity spot-pins through the same run's kernel
    pins = ["bthe", "c", "fthe", "ccthe", "cf", "fjk"]  # ids 0,1,2,6,7,69
    sample = {
        r["word"]: r["tokens"]
        for r in enc.where(F.col("word").isin(pins)).collect()
    }
    assert set(sample) == set(pins), sorted(sample)
    for w, toks in sample.items():
        want = list(w[:-3]) + ["the"] if w.endswith("the") else list(w)
        assert toks == want, (w, toks, want)
    print(
        f"check2 OK: {n_words} distinct words through the Arrow kernel, "
        f"all n_tokens exact ({time.time() - t0:.1f}s)"
    )


def check3_budget_closed_form(spark, n_sources: int = 200, L: int = 500) -> None:
    from pysparkflow.llmops.bpe import DEFAULT_MERGES, bpe_token_budget

    t0 = time.time()
    # j* = max j with 100 * cum_j <= 60 * total, cum_j = j(2L-j+1)/2 —
    # the doubled integer form replays the operator's comparison exactly
    j_star = 0
    for j in range(1, L + 1):
        if 100 * j * (2 * L - j + 1) <= 60 * L * (L + 1):
            j_star = j
        else:
            break
    docs = (
        spark.range(n_sources * L)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % n_sources).cast("string").alias("source"),
            (F.floor(F.col("id") / n_sources) + 1).alias("c"),
        )
        .select(
            "doc_id",
            "source",
            F.repeat(F.lit("the "), F.col("c").cast("int")).alias("text"),
        )
    )
    kept = bpe_token_budget(docs, DEFAULT_MERGES, budget_frac_pct=60)
    per_src = kept.groupBy("group").agg(
        F.count("*").alias("n_kept"),
        F.min("n_bpe_tokens").alias("min_len"),
        F.max("n_bpe_tokens").alias("max_len"),
    )
    bad = per_src.where(
        (F.col("n_kept") != F.lit(j_star))
        | (F.col("min_len") != F.lit(L - j_star + 1))
        | (F.col("max_len") != F.lit(L))
    ).count()
    n_src = per_src.count()
    assert n_src == n_sources, (n_src, n_sources)
    assert bad == 0, f"{bad} sources off the closed form (j*={j_star})"
    print(
        f"check3 OK: {n_sources} sources x {L} docs, each keeps exactly "
        f"j*={j_star} docs of lengths {L - j_star + 1}..{L} "
        f"({time.time() - t0:.1f}s)"
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_words = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    from pysparkflow.session import get_spark

    spark = get_spark(
        app_name="r12-scale", master="local[32]", shuffle_partitions=32
    )
    check1_corpus_accounting(spark, n_docs)
    check2_vocab_kernel(spark, n_words)
    check3_budget_closed_form(spark)
    print("r12_scale PASSED")


if __name__ == "__main__":
    main()
