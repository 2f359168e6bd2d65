"""Raw document ingest: JSONL / CSV → the canonical documents schema.

The graded testdata arrives as parquet, but a real corpus lands as
JSONL (Common-Crawl-style dumps) or CSV exports. These readers apply
the reference's malformed-input discipline (per-record tolerance, never
job failure — ff5/FordFulkerson.java:91-92) via Spark's PERMISSIVE mode:
undecodable records are quarantined into a ``_corrupt`` column instead
of killing the scan, and the caller chooses to count, sample, or drop
them. Schema is declared up front — schema inference would re-scan the
input and produce drifting types at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, drop_corrupt: bool = True
) -> DataFrame:
    """JSONL → documents. One JSON object per line; gzip transparent.
    Records that fail to parse (or type-mismatch) land whole in
    ``_corrupt``; with ``drop_corrupt`` they are filtered out (count them
    first via ``corrupt_count`` when auditing an ingest)."""
    df = (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    return _finish(df, drop_corrupt)


def read_documents_csv(
    spark: SparkSession, path: str, drop_corrupt: bool = True, **options
) -> DataFrame:
    """CSV → documents (header expected; quoting/escape via options)."""
    df = (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("header", "true")
        .options(**options)
        .csv(path)
    )
    return _finish(df, drop_corrupt)


def _finish(df: DataFrame, drop_corrupt: bool) -> DataFrame:
    if drop_corrupt:
        df = df.where(F.col("_corrupt").isNull()).drop("_corrupt")
        # n_chars is derivable; fill it when the dump omitted it
        return df.withColumn(
            "n_chars", F.coalesce(F.col("n_chars"), F.length("text").cast("long"))
        )
    return df


def corrupt_count(df: DataFrame) -> int:
    """Number of quarantined records in a ``drop_corrupt=False`` read.

    Spark disallows queries referencing ONLY the internal corrupt-record
    column directly over a raw JSON/CSV scan; the documented workaround
    is to materialize the parse first (an audit pass — run it on a
    sample/slice of a 100 TB ingest, not the whole dump)."""
    df = df.cache()
    try:
        return df.where(F.col("_corrupt").isNotNull()).count()
    finally:
        df.unpersist(blocking=False)
