"""Round-9 operator scale evidence with planted truth (SCALING.md):
the mixture_report composition audit (VERDICT r8 #4).

Everything is generated IN SPARK (map-only, deterministic, no driver
data) and every report column has a CLOSED-FORM expected value:

* corpus: n_docs docs (n_docs % 240 == 0 so every residue class below
  splits exactly), source = floor(id/2) % 8 (8 equal sources, parity-
  balanced), text = fluent template x (id%3 + 2) for even ids / junk
  template x (id%3 + 2) for odd ids — the r8_scale 6-class corpus, so
  the quality gate keeps exactly the even half and each kept doc's
  score is one of three hand-computable values f2 < f3 < f4.
* planted dedup clusters: slot = id/2; every slot ≡ 3 (mod 5) is a
  LOSER (best = the slot-1 doc), every slot ≡ 2 (mod 5) the matching
  winner (best = itself). CRT over (mod 8 source, mod 5 role) makes
  exactly 1/5 of every source's kept docs losers.
* therefore, per source (all 8 identical): n_total = n/8,
  n_kept = n/16, gate_rate = 0.5, total_tokens = 33 * n_kept
  (11 tokens x mean reps 3), q_p25/q_p50/q_p75 = round(f2/f3/f4, 4)
  (each score fills a third of the sorted kept block, so the p*(N-1)
  interpolation points land strictly inside the f2/f3/f4 runs), and
  survivor_rate = 0.8 exactly.

A single mismatching source fails the run — the report operator's one
aggregation pass must reproduce all 9 columns exactly at millions of
rows, not just at the 500-row graded scale.

Usage: python tools/r9_scale.py [n_docs] (default 2_400_000; rounded
down to a multiple of 240)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pysparkflow.llmops.quality_model import quality_classify
from pysparkflow.llmops.report import mixture_report
from pysparkflow.session import get_spark

# the r8_scale planted corpus (keep the templates in lockstep with
# tools/r8_scale.py — _hand_score is shared arithmetic)
GOOD = "the story of the day and the life of it all "
BAD = "tbl 99 x4 17 zz 42 "


def _hand_score(text: str) -> float:
    import math

    from pysparkflow.llmops.quality_model import QUALITY_WEIGHTS as w

    toks = text.strip().split()
    n_tokens = len(toks)
    n_chars = len(text)
    punct = sum(text.count(c) for c in ".,;:!?")
    digit = sum(text.count(c) for c in "0123456789")
    stop = text.count(" the ") + text.count(" and ") + text.count(" of ")
    z = (
        w["intercept"]
        + w["log_tokens"] * math.log(1.0 + n_tokens)
        + w["avg_token_len"] * round(n_chars / n_tokens, 4)
        + w["punct_ratio"] * round(punct / n_chars, 4)
        + w["digit_ratio"] * round(digit / n_chars, 4)
        + w["stopword_ratio"] * round(stop / n_tokens, 4)
    )
    return round(1.0 / (1.0 + math.exp(-z)), 6)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    n_docs -= n_docs % 240
    assert n_docs >= 240
    spark = get_spark(
        app_name="r9-scale", master="local[32]", shuffle_partitions=32
    )
    t_all = time.time()

    reps = (F.col("id") % 3 + 2).cast("int")
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.floor(F.col("id") / 2) % 8).cast("string").alias("source"),
        F.when(F.col("id") % 2 == 0, F.repeat(F.lit(GOOD), reps))
        .otherwise(F.repeat(F.lit(BAD), reps))
        .alias("text"),
    )
    scored = quality_classify(docs)

    # planted clusters over slots (= kept docs): slot ≡ 3 (mod 5) loses
    # to slot-1; slot ≡ 2 (mod 5) is that winner
    slots = spark.range(n_docs // 2).select(F.col("id").alias("slot"))
    losers = slots.where(F.col("slot") % 5 == 3).select(
        (F.col("slot") * 2).alias("doc_id"),
        ((F.col("slot") - 1) * 2).alias("best_id"),
    )
    winners = slots.where(F.col("slot") % 5 == 2).select(
        (F.col("slot") * 2).alias("doc_id"),
        (F.col("slot") * 2).alias("best_id"),
    )
    survivors = losers.unionByName(winners)

    t0 = time.time()
    rows = mixture_report(docs, scored, survivors).collect()
    report_sec = round(time.time() - t0, 2)

    f = {r: _hand_score(GOOD * (r + 2)) for r in (0, 1, 2)}
    # kept scores by id%3: id = 2*slot -> reps residue (2*slot) % 3
    vals = sorted(f.values())
    expect = {
        "n_total": n_docs // 8,
        "n_kept": n_docs // 16,
        "gate_rate": 0.5,
        "total_tokens": 33 * (n_docs // 16),
        "q_p25": round(vals[0], 4),
        "q_p50": round(vals[1], 4),
        "q_p75": round(vals[2], 4),
        "survivor_rate": 0.8,
    }
    assert len(rows) == 8, len(rows)
    n_bad = 0
    for r in rows:
        got = {k: r[k] for k in expect}
        if got != expect:
            n_bad += 1
            print(f"MISMATCH source={r['source']}: {got} != {expect}")
    print(
        f"mixture_report: {n_docs} docs, 8 sources, {n_bad} mismatching "
        f"sources ({report_sec}s; total {round(time.time() - t_all, 2)}s)"
    )
    assert n_bad == 0
    print("R9 SCALE EVIDENCE PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
