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

RESULTS_SCHEMA = (
    "url string, url_fp long, host string, depth int, score double, "
    "parent_url string, wave int, status string, lang string, "
    "n_internal_links int, n_external_links int, title string, "
    "raw_markdown string, markdown_with_citations string, references_markdown string"
)


def results_stream(spark: SparkSession, store_dir: str) -> DataFrame:
    """Tail a crawl's results table as a streaming DataFrame — new wave
    commits appear as new micro-batch input (file source tracks files,
    matching the wave store's append-only layout)."""
    path = os.path.join(store_dir, "tables", "results")
    return (
        spark.readStream.schema(RESULTS_SCHEMA)
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
