"""Sequence packing: assign documents to fixed-token-budget training
examples (GPT-style concat-and-chunk assembly).

Pretraining consumes fixed-length examples; the assembly step
concatenates documents in a deterministic order and chunks the token
stream every ``budget`` tokens. This operator computes, for every
document, WHERE it lands: its packing bucket, the example index where it
starts, and its token offset inside that example — enough for a writer
to materialize examples, and enough for audits (which documents share an
example / cross a boundary).

Scale shape: a GLOBAL concatenation order would need a total sort of the
corpus, so the stream is split into ``n_buckets`` independent packing
streams keyed by the portable md5 row hash — the only shuffle is a
hash partition + per-bucket sort (each bucket ~ corpus/n_buckets, sized
to executor memory; at 100 TB raise n_buckets, the semantics don't
change). Order within a bucket is (hash, id): deterministic on any
cluster, any retry. The whole computation is Catalyst windows over
JVM-side token counts — reproducible exactly in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pysparkflow.functions.text import portable_hash32, token_count


def pack_documents(
    docs: DataFrame,
    budget: int = 2048,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """(id, bucket, n_tokens, example_id, offset): the document's packing
    position under concat-and-chunk assembly. ``example_id`` is the
    bucket-local index of the budget-sized example where the document
    STARTS; ``offset`` its token offset inside that example. A document
    longer than the remaining space spans into the following example(s)
    (chunk semantics — nothing is dropped)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    h = portable_hash32(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    d = docs.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
        h.alias("_h"),
    )
    w = Window.partitionBy("bucket").orderBy("_h", "id")
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    return (
        d.withColumn("_start", start)
        .select(
            "id",
            "bucket",
            "n_tokens",
            (F.col("_start") / budget).cast("long").alias("example_id"),
            F.pmod("_start", F.lit(budget)).alias("offset"),
        )
    )


def packing_report(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bucket assembly audit over :func:`pack_documents` output —
    the "did the packing waste budget" table a training-data pipeline
    publishes next to the packed dataset.

    (bucket, n_docs, total_tokens, n_examples, utilization, n_spanning):
    concat-and-chunk leaves no internal gaps, so a bucket's example
    count is exactly ceil(total_tokens / budget) and its only waste is
    the tail of the final example — utilization = total_tokens /
    (n_examples * budget). ``n_spanning`` counts documents that cross
    at least one example boundary (offset + n_tokens > budget), the
    fragmentation metric attention-masking cares about.

    Plan shape: ONE aggregation over the packing table, keyed by the
    same ``bucket`` the packing window already partitioned by — the
    report reuses the exchange ``pack_documents`` already paid; no new
    corpus-sized shuffle, no extra pass over text."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n_examples = F.ceil(F.sum("n_tokens") / F.lit(float(budget)))
    return packed.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        n_examples.cast("long").alias("n_examples"),
        # a bucket whose docs are all zero-token (empty text) packs zero
        # examples; report 0 utilization rather than divide by zero
        F.when(n_examples > 0, F.round(
            F.sum("n_tokens") / (n_examples * F.lit(float(budget))), 6
        )).otherwise(F.lit(0.0)).alias("utilization"),
        F.sum(
            ((F.col("offset") + F.col("n_tokens")) > F.lit(budget)).cast(
                "long"
            )
        ).alias("n_spanning"),
    )
