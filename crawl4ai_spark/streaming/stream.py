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
    sibling ``<root>/staging/<table>/wave=K`` dir — *outside* this streamed
    ``tables/results`` path — and ``os.rename``s it into place only at
    commit, so this file source can never observe an uncommitted wave —
    the stream's visibility IS the commit rename's, with no filtering
    logic here. (Keep staging outside the tables tree: a dot-prefix inside
    it is NOT reliably invisible to Spark's listing.)

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


def streaming_dedup_first_seen(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("url_fp",),
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Cross-micro-batch exact dedup: the first row per key survives,
    later arrivals (any batch) are dropped by the state store. With a
    ``ts_col``, state is bounded by the watermark
    (``dropDuplicatesWithinWatermark`` — at 10⁹ keys unbounded dedup
    state is the thing that kills a long-running stream). Works on a
    batch frame too (plain dropDuplicates), which is the test oracle."""
    keys = list(key_cols)
    if df.isStreaming and ts_col is not None:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
            ts_col, watermark
        )
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


HOST_TOTALS_SCHEMA = "host string, n_pages long, total_bytes long"
_HOST_STATE_SCHEMA = "n long, b long"


def host_running_totals(
    pages: DataFrame, host_col: str = "host", bytes_col: str = "n_bytes"
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-host
    cumulative page count + byte volume across micro-batches — the
    live-crawl monitoring view the reference's dispatcher keeps in
    process memory (async_dispatcher.py result aggregation), here as
    distributed keyed state that survives restarts via the checkpoint.
    Emits one updated row per host per batch."""
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_totals(key, pdfs, state):
        import pandas as pd

        n, b = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            b += int(pdf[bytes_col].fillna(0).sum())
        state.update((n, b))
        yield pd.DataFrame({"host": [key[0]], "n_pages": [n], "total_bytes": [b]})

    return pages.groupBy(host_col).applyInPandasWithState(
        update_totals,
        HOST_TOTALS_SCHEMA,
        _HOST_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
