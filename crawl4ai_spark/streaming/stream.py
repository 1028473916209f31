"""Structured Streaming surface of the engine.

The reference's "streaming" is completion-order async generators
(``crawl4ai/async_webcrawler.py:1108-1119`` arun_many(stream=True),
``async_dispatcher.py:530-636``) — no watermarks, no event time. In the
batch-iterated engine the canonical stream is **the results table
itself**: every wave commit appends parquet files, and downstream
consumers tail them with a file-source readStream (SURVEY.md §2.12).

On top of that, this module provides proper event-time processing for
the ``events``-style telemetry the reference never had: tumbling/sliding
windows with watermarked late-data handling — the Spark-native upgrade
path for crawl metrics pipelines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def results_stream(spark: SparkSession, store_dir: str, schema=None) -> DataFrame:
    """Tail a crawl's results table as a streaming DataFrame — each wave
    commit appears as new micro-batch input.

    Marker-consistent by construction: the WaveStore writes each wave to a
    dot-prefixed staging dir (invisible to Spark's file listing) and
    renames it into place only at commit, so this file source can never
    observe an uncommitted wave — the stream's visibility IS the commit
    marker's, with no filtering logic here.

    ``schema`` defaults to the schema of the already-committed files
    (readStream requires one up front); pass it explicitly to tail a
    store that hasn't committed its first wave yet.
    """
    path = os.path.join(store_dir, "tables", "results")
    if schema is None:
        schema = spark.read.option("recursiveFileLookup", "true").parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per key.

    Works identically on a streaming or batch DataFrame (the batch run is
    the oracle for the streaming run — see tests)."""
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC so
    # the cast is value-preserving and batch/stream stay identical
    df = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        df.groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "avg_value",
        )
    )


def run_windowed_events_batch_equivalent(
    spark: SparkSession, events_path: str, checkpoint_dir: str, window: str = "1 hour"
) -> tuple[list, list]:
    """Run the SAME windowed aggregation once as a stream (availableNow,
    complete mode into a memory sink) and once as a batch; return both
    sorted result lists. Streaming/batch equivalence is the correctness
    contract for the streaming surface."""
    batch_df = spark.read.parquet(events_path)
    batch = sorted(
        [tuple(r) for r in windowed_event_counts(batch_df, window=window).collect()]
    )

    stream_src = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_path)
    )
    query = (
        windowed_event_counts(stream_src, window=window)
        .writeStream.format("memory")
        .queryName("windowed_events_test")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)
    streamed = sorted(
        [tuple(r) for r in spark.sql("SELECT * FROM windowed_events_test").collect()]
    )
    return streamed, batch
