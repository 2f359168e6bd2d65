"""Structured Streaming operators over the events table.

The reference has no streaming surface (SURVEY.md §2.9 — its iteration is
batch rounds); this extends the engine to the streaming side of a data
pipeline: watermarked tumbling-window aggregation with late-data handling.
For local smoke, a parquet-directory source + memory sink driven to
completion synchronously (processAllAvailable) — the same plan runs against
kafka at scale by swapping the source."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# physical schema: ts is parquet TIMESTAMP(NANOS), readable only as long
# (spark.sql.legacy.parquet.nanosAsLong); converted to a microsecond
# timestamp right after the scan.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts+sums per event_type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_windowed_counts_batchlike(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "windowed_events",
) -> DataFrame:
    """Drive the streaming plan over a static parquet directory to
    completion (memory sink, processAllAvailable) and return the result as
    a DataFrame — the local-smoke harness for the streaming path."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # file-stream sources want a directory; point at the parent dir with a
    # glob filter for the single table file
    base = os.path.dirname(events_path.rstrip("/"))
    fname = os.path.basename(events_path.rstrip("/"))
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", fname)
        .load(base)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = windowed_event_counts(stream, window=window, watermark=watermark)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
