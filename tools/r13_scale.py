"""Round-13 scale evidence with planted truth (SCALING.md): the BPE
TRAINING -> APPLICATION chain — bpe_train / train_merges /
bpe_train_encode (llmops/bpe.py, VERDICT r12 #2).

Check 1 (corpus-scale training, default 2,000,000 documents, 2-word
vocab): every doc's text is exactly "aaab aaab aaab ab ab", so
freq(aaab) = 3N and freq(ab) = 2N scale with the corpus but the
RELATIVE pair counts — and therefore the whole adoption sequence — do
not: the trainer must learn exactly
    (a,a, 6N) -> (a,b, 5N) -> (aa,ab, 3N) -> early stop
at ANY N (round-1 pairs: (a,a) 2*3N, (a,b) 3N+2N; round 2: state
[aa,a,b]x3N + [a,b]x2N gives (aa,a) 3N < (a,b) 5N; round 3: [aa,ab]x3N
gives (aa,ab) 3N; round 4: single tokens everywhere -> stop). This is
the 100 TB claim made concrete: rounds and learned rules are a
function of the VOCABULARY, corpus rows only scale the counts, and the
only corpus-sized work is the one word-frequency aggregation.

Check 1b (the chain, same corpus): bpe_train_encode under the learned
list encodes "aaab" and "ab" to single tokens, so every doc must read
exactly (n_words 5, n_bpe_tokens 5, max_token 'ab') — per-doc exact at
2M docs, proving the learned list actually drives the encoder.

Check 2 (vocab-scale trainer, default 200,000 distinct words): a
driver-side dictionary of 200k unique junk words on the alphabet
{b,c,f,j,k} (conv base-5, each freq 1) plus the two planted head words
at freq 10,000,000 — head and tail alphabets are DISJOINT, so the head
adoption sequence and its exact counts are unchanged from check 1
(6e7/5e7/3e7, far above any tail pair's reach of ~1.4M occurrences).
Pins the trainer loop itself at a vocabulary three orders beyond the
graded corpora and reports per-round wall time (the vocab-sized cost).

Check 3 (embedding_quantize planted truth, default 1,996,800 vectors x
64 dims): exact closed-form codes/sums and replayed-through-the-same-
double-ops error expectations — see check3_quantize_planted.

Usage: python tools/r13_scale.py [n_docs] [n_words] [n_vecs]
(defaults 2_000_000 200_000 1_996_800; smoke:
python tools/r13_scale.py 40000 20000 38400)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

PLANTED = "aaab aaab aaab ab ab"


def _expected(n: int) -> list:
    return [("a", "a", 6 * n), ("a", "b", 5 * n), ("aa", "ab", 3 * n)]


def check1_corpus_training(spark, n_docs: int) -> None:
    from pysparkflow.llmops.bpe import bpe_train, bpe_train_encode

    t0 = time.time()
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.lit(PLANTED).alias("text")
    )
    learned = bpe_train(docs, n_merges=10)
    assert learned == _expected(n_docs), learned
    print(
        f"check1 OK: {n_docs} docs -> learned merges exactly "
        f"{[(l, r) for l, r, _ in learned]} with counts (6N, 5N, 3N), "
        f"early stop after 3 of 10 rounds ({time.time() - t0:.1f}s)"
    )

    t0 = time.time()
    out = bpe_train_encode(docs, n_merges=10)
    bad = out.where(
        (F.col("n_words") != 5)
        | (F.col("n_bpe_tokens") != 5)
        | (F.col("max_token") != F.lit("ab"))
    ).count()
    total = out.count()
    assert total == n_docs, (total, n_docs)
    assert bad == 0, f"{bad} documents off the closed form"
    print(
        f"check1b OK: train->encode chain exact on all {n_docs} docs "
        f"(5 words -> 5 learned-list tokens each) ({time.time() - t0:.1f}s)"
    )


def check2_vocab_trainer(n_words: int) -> None:
    from pysparkflow.llmops.bpe import train_merges

    # base-5 junk tail on a head-disjoint alphabet, every word unique
    tail = []
    digits = "bcfjk"
    for i in range(n_words):
        w, x = [], i
        while True:
            w.append(digits[x % 5])
            x //= 5
            if x == 0:
                break
        tail.append(("".join(w), 1))
    head_f = 10_000_000
    wf = [("aaab", 3 * head_f), ("ab", 2 * head_f)] + tail

    t0 = time.time()
    learned3 = train_merges(wf, 3)
    t3 = time.time() - t0
    assert learned3 == _expected(head_f), learned3[:3]
    t0 = time.time()
    learned6 = train_merges(wf, 6)
    t6 = time.time() - t0
    # rounds 4-6 adopt tail pairs; the head prefix must be unchanged
    assert learned6[:3] == learned3
    assert all(n <= 3 * n_words for _, _, n in learned6[3:])
    print(
        f"check2 OK: {n_words + 2}-word dictionary — head merges exact "
        f"under a {n_words}-word tail; 3 rounds {t3:.1f}s, 6 rounds "
        f"{t6:.1f}s (~{t6 / max(t3, 1e-9):.1f}x: per-round cost is "
        f"vocab-sized, not corpus-sized)"
    )


def check3_quantize_planted(spark, n_vecs: int) -> None:
    """embedding_quantize planted truth (llmops/quantize.py) at corpus
    scale. 64-dim vectors over residue classes mod 3840 = lcm(256,3,10):

      dims 0..61: value (i % 256) * 2^-8 — step and values are exact
        binary floats, so code = i % 256 EXACTLY and reconstruction is
        EXACT (zero error): pins the code arithmetic at scale.
      dim 62: {0.0, 0.25, 1.0} by i % 3 — code {0, 63, 255}; the 0.25
        rows carry the one nonzero error, whose expectation is replayed
        in Python THROUGH THE SAME double ops (the r10 lesson: planted
        expectations go through the operator's own rounding).
      dim 63: constant 7.0 — the mx == mn guard branch at scale.

    sum_codes per label is a closed-form BIGINT (exact equality at any
    n divisible by 3840); avg_mse/max_abs_err replayed to 1e-9/exact.
    The corpus-sized work is ONE map-only pass; the only exchanges are
    dim-, row- and label-sized (plan audited in the registry entry)."""
    from pysparkflow.llmops.quantize import quantize_report

    n_vecs -= n_vecs % 3840
    assert n_vecs > 0
    t0 = time.time()
    i = F.col("id")
    dim62 = (
        F.when(i % 3 == 0, F.lit(0.0))
        .when(i % 3 == 1, F.lit(0.25))
        .otherwise(F.lit(1.0))
    )
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 10).cast("int").alias("label"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: F.when(d < 62, (i % 256).cast("double") * 0.00390625)
            .when(d == 62, dim62)
            .otherwise(F.lit(7.0)),
        )
        .cast("array<float>")
        .alias("embedding"),
    )
    got = {
        r["label"]: r
        for r in quantize_report(emb, "embedding", "label").collect()
    }
    mult = n_vecs // 3840
    err = 0.25 - (0.0 + 63 * (1.0 - 0.0) / 255.0)
    mse_vec = round((err * err) / 64, 9)
    for lab in range(10):
        res = [r for r in range(3840) if r % 10 == lab]
        want_codes = mult * sum(
            62 * (r % 256) + (0, 63, 255)[r % 3] for r in res
        )
        c1 = sum(1 for r in res if r % 3 == 1)
        g = got[lab]
        assert g["n_vecs"] == len(res) * mult, lab
        assert g["sum_codes"] == want_codes, (lab, g["sum_codes"], want_codes)
        assert abs(g["avg_mse"] - round(mse_vec * c1 / len(res), 9)) <= 1e-9
        assert g["max_abs_err"] == round(abs(err), 9), lab
    print(
        f"check3 OK: quantize planted exact at {n_vecs} vectors x 64 dims "
        f"({time.time() - t0:.1f}s)"
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_words = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_996_800
    from pysparkflow.session import get_spark

    spark = get_spark(
        app_name="r13-scale", master="local[32]", shuffle_partitions=32
    )
    check1_corpus_training(spark, n_docs)
    check2_vocab_trainer(n_words)
    check3_quantize_planted(spark, n_vecs)
    print("r13_scale PASSED")


if __name__ == "__main__":
    main()
