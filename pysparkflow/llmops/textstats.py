"""Text analysis operators: quality scoring, language-ID heuristic, token
counting, fingerprinting — the per-document feature pass of a training-data
pipeline. Everything is built-in column arithmetic (codegen'd, scan-fused);
the expressions are deliberately reproducible in ANSI SQL so the DuckDB
oracle can check them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pysparkflow.functions.text import token_count

# marker stopwords per language for the n-gram/stopword-hit heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " das "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
}


def _occurrences(text: Column, marker: str) -> Column:
    """Count of non-overlapping occurrences via the length-difference trick
    ((len - len(replace)) / len(marker)) — identical semantics in Spark and
    ANSI SQL, so oracle-checkable without exposing engine hash functions."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality features: (id, n_chars, n_tokens, avg_token_len,
    punct_ratio, digit_ratio, stopword_ratio) — the length/punct/stopword
    heuristics used to filter low-quality web text."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(text_col)
    stop_hits = None
    for m in LANG_MARKERS["en"]:
        h = _occurrences(t, m)
        stop_hits = h if stop_hits is None else stop_hits + h
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    digits = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    # n_tokens >= 1 in BOTH engines (split of a trimmed empty string is
    # [""], length 1), so those divisions are safe; n_chars is 0 for an
    # empty document — try_divide yields NULL there, matching DuckDB's
    # 0/0 -> NULL, where Spark's ANSI `/` would kill the job on the
    # first empty doc of a real crawl
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars / n_tokens, 4).alias("avg_token_len"),
        F.round(F.try_divide(punct, n_chars), 4).alias("punct_ratio"),
        F.round(F.try_divide(digits, n_chars), 4).alias("digit_ratio"),
        F.round(stop_hits / n_tokens, 4).alias("stopword_ratio"),
    )


def language_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Language-ID heuristic: per-language marker-stopword hit counts and the
    argmax language (ties broken by language code order for determinism).
    Returns (id, score_en, score_de, score_fr, score_es, lang_pred)."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        s = None
        for m in markers:
            h = _occurrences(t, m)
            s = h if s is None else s + h
        scores[lang] = s
    best = None
    for lang in sorted(LANG_MARKERS):
        cand = F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
        best = cand if best is None else F.when(
            scores[lang] > best["score"], cand
        ).otherwise(best)
    return df.select(
        F.col(id_col).alias("id"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        best["lang"].alias("lang_pred"),
    )


def rolling_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Winnowing-style document fingerprints: hash every token, then keep
    the minimum hash of each sliding window of ``window`` token-hashes.
    Output: (id, fingerprints array<long>) — a compact sketch for
    plagiarism/near-dup detection.

    The token hash is the md5-derived ``portable_hash32`` semantics (hex
    word 0 of md5 as an int), so the DuckDB oracle reproduces the
    fingerprints exactly. Computed in an Arrow-batched ``mapInPandas``
    rather than array higher-order functions: Spark evaluates HOF lambdas
    interpreted (no codegen), and an md5+hex-parse chain per token there
    measured ~4x slower than hashlib + a numpy sliding-window min. The
    operator stays map-only — no shuffle, partitioning preserved."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    # match Spark trim (space only) + Java/RE2 \s exactly — Python's str
    # \s would also split on unicode whitespace the engines keep intact
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    w = int(window)

    def op(batches):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids, fps = [], []
            for doc_id, txt in zip(pdf["id"], pdf[text_col]):
                # NULL / empty / whitespace-only text -> empty sketch
                # (malformed-input tolerance, ff5/FordFulkerson.java:91-92)
                if txt is None or not (stripped := txt.strip(" ")) :
                    ids.append(doc_id)
                    fps.append([])
                    continue
                toks = ws.split(stripped)
                hs = np.fromiter(
                    (
                        int.from_bytes(hashlib.md5(t.encode()).digest()[:4], "big")
                        for t in toks
                    ),
                    dtype=np.int64,
                    count=len(toks),
                )
                if len(hs) >= w:
                    mins = sliding_window_view(hs, w).min(axis=1)
                    # first-occurrence dedup == array_distinct order
                    out = list(dict.fromkeys(mins.tolist()))
                else:
                    out = [int(hs.min())]
                ids.append(doc_id)
                fps.append(out)
            yield pd.DataFrame({"id": ids, "fingerprints": fps})

    return df.select(F.col(id_col).alias("id"), F.col(text_col)).mapInPandas(
        op, "id long, fingerprints array<long>"
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document: fraction of duplicate
    word 2-grams / 3-grams, and the most-frequent token's share of all
    tokens. High values mark boilerplate/spam for quality filtering.

    One Arrow-batched map-only pass (mapInPandas): per document a single
    token scan builds the 2/3-gram multisets and the token counter —
    no shuffle at any corpus size. Catalyst higher-order functions were
    measured pathological here (interpreted, and the shingle transform
    re-evaluates per reference — 23s vs <2s for 5k docs); same lesson as
    rolling_fingerprints. Tokenization and HALF_UP rounding exactly
    mirror the engine/oracle idiom (split(trim(text), '\\s+'),
    round(x, 6)) so the DuckDB oracle hash-matches."""
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    # space-only trim + Java \s split — lockstep with functions.text.tokens
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    Q = Decimal("0.000001")

    def r6(x: float) -> float:
        # Spark round(double, 6) = BigDecimal HALF_UP, not banker's
        return float(Decimal(repr(x)).quantize(Q, rounding=ROUND_HALF_UP))

    def dup_frac(toks: list[str], n: int) -> float:
        total = len(toks) - n + 1
        if total <= 0:
            return 0.0
        grams = Counter(tuple(toks[i : i + n]) for i in range(total))
        return r6((total - len(grams)) / total)

    def op(batches):
        for pdf in batches:
            ids, d2, d3, top = [], [], [], []
            for doc_id, txt in zip(pdf["id"], pdf[text_col]):
                toks = ws.split(txt.strip(" ")) if txt else [""]
                counts = Counter(toks)
                ids.append(doc_id)
                d2.append(dup_frac(toks, 2))
                d3.append(dup_frac(toks, 3))
                top.append(r6(max(counts.values()) / len(toks)))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "dup_2gram_frac": d2,
                    "dup_3gram_frac": d3,
                    "top_word_frac": top,
                }
            )

    return df.select(F.col(id_col).alias("id"), F.col(text_col)).mapInPandas(
        op, "id long, dup_2gram_frac double, dup_3gram_frac double, top_word_frac double"
    )
