"""Text scrubbing: PII redaction and blocklist-term removal.

A training-data pipeline scrubs personally identifiable information
(emails, phone numbers, IP addresses) and policy-blocked terms from
document text before anything downstream sees it. Both are map-only
column transformations — chained ``regexp_replace`` plus a
``regexp_count`` per pattern family, fused into the parquet scan by
Catalyst: at 100 TB the cost is the scan itself, with zero shuffle and
no Python in the path.

Patterns are written in the common subset of Java regex (Spark) and RE2
(DuckDB/Go) so the DuckDB oracle replays them verbatim: no lookbehind,
no backreferences, ``\\b`` word boundaries only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# PII pattern families (ordered: applied in sequence). Each is a
# (family, regex, replacement-token) triple. Order matters for the
# REPLACEMENT chain (counts are always against the original text):
# id_number runs before phone so an unbroken 12-digit account number is
# redacted whole as <ID> rather than losing its first ten digits to the
# looser phone shape.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("id_number", r"\b\d{9,}\b", "<ID>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"(\+?\d{1,3}[-. ])?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}", "<PHONE>"),
]


def blocklist_pattern(terms: list[str]) -> str:
    """Whole-word alternation for a term blocklist (RE2/Java-common)."""
    if not terms:
        raise ValueError("empty blocklist")
    return r"\b(" + "|".join(sorted(terms)) + r")\b"


def scrub_text(
    df: DataFrame,
    patterns: list[tuple[str, str, str]] | None = None,
    text_col: str = "text",
    out_col: str = "text_clean",
) -> DataFrame:
    """Apply the pattern families in order; emit the scrubbed text plus a
    per-family hit count (``n_<family>`` columns, counted BEFORE any
    replacement so earlier families can't mask later counts — counts are
    all taken against the original text, then replacements are chained).

    Chained replacement means a later family sees earlier replacement
    tokens, not the original match — the token alphabet (``<EMAIL>`` etc.)
    is chosen to never re-match any family.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    text: Column = F.col(text_col)
    out = df
    for family, regex, _ in pats:
        out = out.withColumn(f"n_{family}", F.regexp_count(text, F.lit(regex)))
    cleaned: Column = text
    for _, regex, token in pats:
        cleaned = F.regexp_replace(cleaned, regex, token)
    return out.withColumn(out_col, cleaned)


def scrub_blocklist(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    out_col: str = "text_clean",
    token: str = "<BLOCKED>",
) -> DataFrame:
    """Blocklist scrub as a single pattern family (``n_blocked`` count +
    replaced text). Same scan-fused shape as the PII families."""
    return scrub_text(
        df,
        patterns=[("blocked", blocklist_pattern(terms), token)],
        text_col=text_col,
        out_col=out_col,
    )
