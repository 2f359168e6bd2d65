"""Bloom-prefiltered join: drop fact rows that cannot match BEFORE the
join exchange.

The scale problem this solves: a fact⋈dim join where dim is too large
to broadcast as DATA (so Catalyst picks a shuffle join) still shuffles
every fact row — including the vast majority whose key does not appear
in dim at all when dim is selective. A Bloom filter over dim's key set
is a few orders of magnitude smaller than dim itself and CAN ship to
every task; probing it before the exchange means only candidate fact
rows are ever shuffled. Spark's optimizer injects this automatically in
some shapes (runtime bloom filter under AQE); this operator is the
explicit, always-on form with a measurable plan.

Everything stays JVM-side and distributed: the filter is represented as
a DataFrame of (word_index, 64-bit word) rows — m/64 rows for an m-bit
filter — built with one aggregation over dim's keys and broadcast-
joined against the fact side's probe positions. No driver-side bitmap,
no Python in the hot path; the probe is xxhash64 + bit arithmetic in
whole-stage codegen. False positives are removed by the exact join that
follows (the filter is a superset gate, so results are byte-identical
to the plain join — which is exactly what the oracle replays).

Sizing: ~10 bits per distinct key with k=2 probes gives ~3% false-
positive rate; the single scalar count() that sizes the filter is the
operator's only driver-side value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m: int, n_hashes: int) -> list[Column]:
    """k bit positions for a key: pmod(xxhash64(key, seed), m). The seed
    goes in as a literal second hash input — xxhash64 is deterministic
    across executors, the house requirement for anything that gates
    rows — and hashes the column AT ITS OWN TYPE: no cast, so string /
    decimal / date keys work, and a malformed value can never throw the
    ANSI cast error a ``cast('long')`` here once did. The only
    requirement is that ``fact_key`` and ``dim_key`` share a type (the
    join condition already requires that)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(n_hashes)
    ]


def _word(pos: str) -> Column:
    return F.expr(f"{pos} DIV 64")


def _mask(pos: str) -> Column:
    return F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))")


def bloom_prefiltered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_hashes: int = 2,
    bits_per_key: int = 10,
) -> DataFrame:
    """Inner-join ``fact`` with ``dim`` on ``fact_key == dim_key``, with
    fact rows pre-filtered through a Bloom filter of dim's key set so
    non-candidate rows never reach the join exchange. Returns the same
    rows as the plain inner join (bloom passes a superset; the join
    removes false positives).

    The bloom table is m/64 rows of (word, bits) — e.g. a 10M-key dim
    at 10 bits/key is a 1.6M-row, ~25 MB table, broadcastable where the
    dim itself is not. Each of the k probes is a broadcast hash join
    against that table plus a codegen'd bit test."""
    f_type = fact.schema[fact_key].dataType
    d_type = dim.schema[dim_key].dataType
    if f_type != d_type:
        # xxhash64 hashes a value AT ITS TYPE (int 7 and bigint 7 hash
        # differently), so mismatched key types would silently drop true
        # matches — the one failure mode a Bloom prefilter must never
        # have. Make the precondition explicit instead of guessing a
        # coercion.
        raise ValueError(
            f"bloom_prefiltered_join requires matching key types, got "
            f"{fact_key}: {f_type.simpleString()} vs "
            f"{dim_key}: {d_type.simpleString()} — cast one side first"
        )
    n_keys = dim.select(dim_key).distinct().count()
    m = max(1024, n_keys * bits_per_key)
    key = F.col(dim_key)
    bloom = (
        dim.select(
            F.explode(F.array(*_positions(key, m, n_hashes))).alias("_pos")
        )
        .select(_word("_pos").alias("_word"), _mask("_pos").alias("_m"))
        .groupBy("_word")
        .agg(F.bit_or("_m").alias("_bits"))
    )
    probed = fact
    fkey = F.col(fact_key)
    for i, p in enumerate(_positions(fkey, m, n_hashes)):
        b = F.broadcast(
            bloom.select(
                F.col("_word").alias(f"_w{i}"), F.col("_bits").alias(f"_b{i}")
            )
        )
        probed = (
            probed.withColumn(f"_p{i}", p)
            .join(b, _word(f"_p{i}") == F.col(f"_w{i}"), "inner")
            .where(F.col(f"_b{i}").bitwiseAND(_mask(f"_p{i}")) != 0)
            .drop(f"_p{i}", f"_w{i}", f"_b{i}")
        )
    return probed.join(dim, probed[fact_key] == dim[dim_key], "inner")
