"""Structured Streaming operators over the events table.

The reference crawler's progress-event channel (types/progress.go:8-26,
crawler/crawler.go:118-126) is an unbounded event stream consumed by a
live view; the Spark-native analogue is Structured Streaming:
`readStream` over the event source, watermarked tumbling-window
aggregation, `writeStream` into a sink. Here the source is the driver's
`events` parquet and the trigger is `availableNow`, which makes the run
bounded and deterministic — the exact same code runs unbounded on a
directory/Kafka source on a real cluster.

Scale notes: the windowed aggregation is a streaming state-store
hash-agg partitioned on (window, event_type) — state size is bounded by
|windows in watermark| x |event types|, not by input rows, so it holds
at 100 TB of events. The watermark bounds state eviction; complete mode
is only used for the bounded memory-sink test path.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ptt_spider_go_spark.streaming.source import read_table_stream

_MEM_SINK_SEQ = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the driver's events.parquet — layout
    dispatch (single file vs Spark-written part directory) lives in
    streaming.source.read_table_stream (ADVICE r04)."""
    return read_table_stream(spark, sf_dir, "events")


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type. Works on both
    batch and streaming DataFrames (same logical plan); on a stream the
    watermark bounds the aggregation state. Sums go through decimal so
    the result is independent of row arrival order (streaming parity
    with the batch/DuckDB oracle)."""
    # watermarks require TIMESTAMP (not NTZ); session tz is pinned UTC so
    # the cast is exact, and the window start is cast back to NTZ to
    # match the source column type.
    events = events.withColumn("_ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark("_ts", watermark)
    return events.groupBy(
        F.window("_ts", window).alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("total_value"),
    ).select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "event_type", "n", "total_value",
    )


def run_bounded(agg: DataFrame, spark: SparkSession) -> DataFrame:
    """Execute a streaming aggregation to completion (availableNow) into
    an in-memory sink and return the final result as a batch DataFrame.
    Complete output mode: every trigger rewrites the full result, so the
    final table is the fixpoint regardless of file-batch slicing."""
    name = f"stream_sink_{next(_MEM_SINK_SEQ)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
