"""Gap-based sessionization over event streams — the classic web-log
operator a crawl-analytics engine needs next to its hourly rollups
(reference surface: the adaptive crawler / seeder consume per-user event
sequences; sessionization is the standard grouping for them).

Scale shape: one shuffle (hash partition by user for the per-user window;
the window sort is partition-local), then everything else is column
algebra on the already-partitioned frame. Skewed power users are bounded
by their own event counts, not the corpus; there is no global window
anywhere.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_s(c: Column) -> Column:
    """Epoch seconds (fractional) for LTZ and NTZ timestamps alike —
    TIMESTAMP_NTZ has no direct numeric cast; going through
    timestamp_ltz uses the session timezone (the engine pins UTC,
    session.py), which matches how the DuckDB oracle's epoch() reads the
    same naive parquet values."""
    return c.cast("timestamp_ltz").cast("double")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign a session id to every event: a new session starts when the
    gap since the user's previous event exceeds ``gap_minutes``.

    Adds ``session_seq`` (0-based per-user session counter) and
    ``session_id`` ("<user>-<seq>", unique across users).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_s = _epoch_s(F.col(ts_col)) - _epoch_s(prev_ts)
    is_new = F.when(prev_ts.isNull(), F.lit(1)).otherwise(
        (gap_s > gap_minutes * 60.0).cast("int")
    )
    seq = (F.sum(is_new).over(w) - 1).cast("long")
    return events.withColumn("session_seq", seq).withColumn(
        "session_id",
        F.concat(F.col(user_col).cast("string"), F.lit("-"), F.col("session_seq")),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """One row per session: bounds, event count, duration, distinct event
    types. The groupBy reuses the sessionize window's partitioning (both
    hash on user), so no extra shuffle of the event rows."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max(_epoch_s(F.col(ts_col))) - F.min(_epoch_s(F.col(ts_col)))).alias(
            "duration_s"
        ),
    ]
    if "event_type" in events.columns:
        aggs.append(F.count_distinct("event_type").alias("n_event_types"))
    return s.groupBy(user_col, "session_seq").agg(*aggs)
