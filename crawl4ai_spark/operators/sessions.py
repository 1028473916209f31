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
    ``session_id`` ("<user>-<seq>", unique across users). When an
    ``event_id`` column exists it breaks timestamp ties for a
    deterministic ordering; otherwise ordering is by timestamp alone.
    """
    order = [ts_col] + (["event_id"] if "event_id" in events.columns else [])
    w = Window.partitionBy(user_col).orderBy(*order)
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


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest time each
    step can be completed given the previous step happened strictly
    before it (classic conversion funnel). Returns one row per user with
    ``step_1_ts .. step_N_ts`` (NULL once the funnel breaks) and
    ``funnel_depth`` (# of consecutive steps completed).

    Shape: one conditional min-aggregation per step over the same
    user-partitioned frame — N tiny hash aggs on the same key, joined on
    user (co-partitioned: every join key is the same column, so after the
    first shuffle the rest are exchange-free at cluster scale). No
    windows, no per-row Python.
    """
    if not steps:
        raise ValueError("funnel_steps requires at least one step")
    base = events.select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
    out = base.select("user_id").distinct()
    prev_agg = None
    step_aggs = []
    for i, step in enumerate(steps, start=1):
        stage = base.where(F.col("et") == step)
        if prev_agg is not None:
            stage = stage.join(prev_agg, "user_id").where(
                F.col("ts") > F.col(f"step_{i-1}_ts")
            )
        # each step's tiny per-user agg is consumed twice (next stage's
        # gate + the final join) — persist so the plan stays linear in
        # the number of steps instead of doubling per level
        agg = stage.groupBy("user_id").agg(F.min("ts").alias(f"step_{i}_ts")).persist()
        step_aggs.append(agg)
        prev_agg = agg
    for agg in step_aggs:
        out = out.join(agg, "user_id", "left")
    depth = F.lit(0)
    # ascending wrap → the DEEPEST completed step is the outermost test
    for i in range(1, len(steps) + 1):
        depth = F.when(F.col(f"step_{i}_ts").isNotNull(), F.lit(i)).otherwise(depth)
    return out.withColumn("funnel_depth", depth)
