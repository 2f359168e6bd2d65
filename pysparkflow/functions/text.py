"""Text column expressions — all JVM-side built-ins (whole-stage codegen),
no Python UDFs in the hot path.

The reference's only scalar functions are split/parse-long/bit-packing
(SURVEY.md §2.7); ``edge_id`` reproduces its packed undirected edge key
(ff1/Edge.java:31-33). The rest extend the surface toward the
training-data-pipeline operators (token counting, shingling for dedup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization: split(trim(text), '\\s+').

    Chosen because it is reproducible in ANSI SQL oracles
    (regexp_split_to_array in DuckDB) — keep the two in lock-step."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as space-joined strings; empty array when the
    document has fewer than n tokens.

    The token array is BOUND as a lambda variable of a one-element outer
    ``transform`` before the per-index slice loop runs. Interpreted
    higher-order functions re-evaluate every non-lambda-variable
    subexpression of the body once PER ELEMENT — inlining ``tokens(col)``
    directly re-ran the regex split once per shingle (~L times per doc),
    which alone was >60% of the MinHash pipeline's cost at sf0.1. With
    the bind, the split happens exactly once per row no matter how the
    optimizer collapses the caller's projections."""
    toks = tokens(col)

    def build(t: Column) -> Column:
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), build), 1)


def portable_hash32(col: Column | str, word: int = 0) -> Column:
    """32-bit content hash reproducible in ANSI SQL: hex word ``word`` of
    md5 (8 hex chars) parsed as an integer. Spark:
    ``conv(substr(md5(x), 1+8w, 8), 16, 10)``; DuckDB:
    ``('0x' || substr(md5(x), 1+8w, 8))::BIGINT``.

    Used by operators whose DuckDB oracle must recompute the exact same
    hash (MinHash, SimHash, winnowing): xxhash64 is faster but
    engine-internal, which forces those operators down to the weaker
    rows-only correctness check. md5 throughput is amply sufficient for
    token/shingle-sized inputs, and the first words of md5 are
    independent, uniform 32-bit values."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(c.cast("binary")), 1 + 8 * word, 8), 16, 10
    ).cast("long")


def edge_id(a: Column | str, b: Column | str) -> Column:
    """Canonical undirected edge key: two int32-range ids packed into one
    int64, smaller id in the high word (ff1/Edge.java:31-33,
    ff2/Edge.java:12-13)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return (F.least(ca, cb) * F.lit(4294967296) + F.greatest(ca, cb)).cast("long")
