"""Structured Streaming surface.

The reference is a batch desktop tool with no streaming (SURVEY.md §2.10);
the engine still exposes the standard streaming shapes a 100 TB pipeline
needs: watermarked windowed aggregation over an event stream and a
micro-batch alignment sink (foreachBatch → the align operator +
CommittedTable, giving exactly-once-per-partition semantics on top of
the manifest commit log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type.
    Works identically on a static DataFrame (for tests/oracle) and a
    readStream source."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    # parquet TIMESTAMP_NTZ -> TIMESTAMP: watermarks require event-time
    # timestamps; session TZ is pinned UTC so the cast is deterministic
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_events_from_parquet(
    spark: SparkSession, sf_dir: str, schema=None
) -> DataFrame:
    """readStream over the events parquet (one-file micro-batch source
    for tests; a production job swaps in Kafka/files with the same
    downstream plan)."""
    if schema is None:
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )


def run_stream_to_memory(stream_df: DataFrame, query_name: str = "events_out"):
    """Drive a streaming query synchronously to completion (memory sink);
    returns the active query handle after processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    return q
