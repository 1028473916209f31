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
from pyspark.sql.types import ArrayType


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

    Shape: ONE hash shuffle — group by user, collect only the funnel-step
    events as a ts-sorted array, then a single ``F.aggregate`` fold
    extends the completed-prefix chain greedily (an event extends the
    chain iff it is the next step and strictly later than the chain's
    tail; processing in ts order makes the first extension the earliest
    valid one, i.e. exactly "min ts of step i strictly after step i−1").
    No joins, no windows, no persisted intermediates, no per-row Python.
    Per-user memory is bounded by that user's OWN funnel-step event count
    (non-step events are dropped before the collect), the same skew
    exposure as the sessionize window.
    """
    if not steps:
        raise ValueError("funnel_steps requires at least one step")
    n = len(steps)
    # collect only funnel-step events with a usable timestamp (a NULL ts
    # can never satisfy "strictly after the previous step", and letting one
    # into slot 1 would NULL-poison every later ts comparison); the event
    # TYPE travels into the fold so a step name repeated at two positions
    # (e.g. view→click→view) matches whichever slot the chain is at —
    # precomputing one index per event broke repeated-step funnels
    is_step = F.col(type_col).isin(steps)
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    is_step & F.col(ts_col).isNotNull(),
                    F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")),
                )
            )
        ).alias("_ev")
    )
    # invariant: the chain only ever fills slots 1..depth in order, so the
    # accumulator is just the completed prefix — typed from the INPUT's
    # ts column (hardcoding array<timestamp> broke bigint/double epoch
    # columns with DATATYPE_MISMATCH); acc is the fold's bound variable —
    # O(1) access, no expression re-evaluation
    ts_type = events.schema[ts_col].dataType
    steps_lit = F.lit(list(steps))
    chain = F.aggregate(
        F.col("_ev"),
        F.array().cast(ArrayType(ts_type)),
        lambda acc, e: F.when(
            # F.get is 0-based and NULL-safe past the end (a completed
            # chain indexes one past steps_lit; element_at would raise
            # under ANSI mode)
            (e["et"] == F.get(steps_lit, F.size(acc)))
            & ((F.size(acc) == 0) | (e["ts"] > F.element_at(acc, -1))),
            F.concat(acc, F.array(e["ts"])),
        ).otherwise(acc),
    )
    out = per_user.select("user_id", chain.alias("_chain"))
    for i in range(1, n + 1):
        out = out.withColumn(
            f"step_{i}_ts",
            F.when(F.size("_chain") >= i, F.element_at("_chain", i)),
        )
    return out.withColumn("funnel_depth", F.size("_chain")).drop("_ev", "_chain")
