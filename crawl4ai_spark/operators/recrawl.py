"""Recrawl scheduling — change-frequency estimation and Poisson
freshness priority over a URL visit history.

The reference's cache layer detects WHETHER a cached page changed
(`crawl4ai/cache_context.py`, cache_mode gating; head-fingerprint
revalidation re-specified in ``operators/cache.py``) but has no policy
for WHEN to revisit. At 100 TB the revisit policy *is* the crawl budget:
re-fetching everything is quadratic waste, so production crawlers
estimate each page's change rate from the observed revalidation history
and spend fetches where staleness probability is highest.

Estimator: Cho & Garcia-Molina, "Estimating Frequency of Change" (ACM
TOIT 2003). Visits observe only whether the page changed since the last
visit (changes between visits collapse — a censored Poisson process), so
the naive X/n ratio underestimates. Their bias-corrected estimator for n
visits of which X observed a change, at mean inter-visit interval I:

    lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / I

Priority: under the Poisson change model the probability the page is
stale at age ``a`` since its last visit is ``1 - exp(-lambda_hat * a)``
— the recrawl queue orders by it (optionally weighted by page value).

Scale design: one hash aggregation on url (map-side combining) and a
broadcast of the single global "now" row; the estimator and priority are
closed-form column algebra, no windows, no Python. 100 TB of visit logs
is exactly one shuffle of (url, 4 numeric partials).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.operators.sessions import _epoch_s


def change_rate_estimates(
    visits: DataFrame,
    url_col: str = "url",
    ts_col: str = "visit_ts",
    changed_col: str = "changed",
    now: Column | None = None,
) -> DataFrame:
    """Per-URL change-rate + staleness-probability table.

    Input: one row per (re)visit with a boolean ``changed`` (did the
    fingerprint differ from the cached one — the output of
    ``operators.cache.revalidate``). Output per url:

    - ``n_visits``, ``n_changed`` — history size and observed changes
    - ``lambda_per_day`` — Cho/Garcia-Molina bias-corrected change rate
      (NULL when the history can't support an estimate: fewer than two
      visits, or all visits at one instant)
    - ``p_changed`` — Poisson staleness probability at ``now`` (default:
      the history's max timestamp, so the result is a pure function of
      the input); NULL exactly when ``lambda_per_day`` is

    Values are rounded to 6 decimals — the cross-engine equality
    contract shared with the other closed-form oracles.
    """
    ep = _epoch_s(F.col(ts_col))
    agg = visits.groupBy(F.col(url_col).alias("url")).agg(
        F.count("*").alias("n_visits"),
        F.sum(F.col(changed_col).cast("int")).alias("n_changed"),
        F.min(ep).alias("_first_s"),
        F.max(ep).alias("_last_s"),
    )
    if now is None:
        now_df = visits.agg(F.max(ep).alias("_now_s"))
    else:
        now_df = visits.agg(F.max(now).alias("_now_s"))
    joined = agg.crossJoin(F.broadcast(now_df))

    n = F.col("n_visits")
    x = F.col("n_changed")
    ibar = (F.col("_last_s") - F.col("_first_s")) / (n - F.lit(1))
    lam = F.when(
        (n >= 2) & (F.col("_last_s") > F.col("_first_s")),
        -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / ibar,
    )
    age = F.col("_now_s") - F.col("_last_s")
    return joined.select(
        "url",
        "n_visits",
        x.cast("long").alias("n_changed"),
        F.round(lam * F.lit(86400.0), 6).alias("lambda_per_day"),
        F.round(F.lit(1.0) - F.exp(-lam * age), 6).alias("p_changed"),
    )


def revisit_seeds(
    visits: DataFrame,
    budget: int,
    url_col: str = "url",
    ts_col: str = "visit_ts",
    changed_col: str = "changed",
    value: DataFrame | None = None,
    value_col: str = "value",
    horizon_s: float = 86400.0,
) -> DataFrame:
    """The recrawl queue: top-``budget`` URLs by staleness priority,
    ready to seed the next ``run_crawl`` wave.

    Staleness is evaluated ``horizon_s`` seconds past the history's last
    timestamp — i.e. at the time of the wave being scheduled, not at the
    moment the history was written (straight after a revalidation pass
    every page has age 0 and priority would degenerate to the tiebreak;
    the horizon is what lets the change RATE differentiate pages).
    Default: the next daily wave.

    Priority is ``p_changed`` from :func:`change_rate_estimates`; URLs
    whose history can't support an estimate get priority 1.0 — the same
    fail-open posture as the cache layer (``operators/cache.py``: can't
    validate → refetch). An optional ``value`` frame (url → page value,
    e.g. a ``doc_pagerank`` prior) multiplies in, spending the budget on
    pages that are both likely-stale and worth having fresh.

    Scale: the estimate is one hash agg; the cut is orderBy+limit, which
    Spark executes as TakeOrderedAndProject — a per-partition partial
    top-k reduced on the driver, never a global sort shuffle. The value
    join shuffles only the per-URL estimate table (|urls|, not |visits|).
    Deterministic: ties break on url.
    """
    est = change_rate_estimates(
        visits,
        url_col,
        ts_col,
        changed_col,
        now=_epoch_s(F.col(ts_col)) + F.lit(float(horizon_s)),
    )
    pr = F.coalesce(F.col("p_changed"), F.lit(1.0))
    if value is not None:
        v = value.select(
            F.col(url_col).alias("url"), F.col(value_col).alias("_value")
        )
        est = est.join(v, "url", "left")
        pr = pr * F.coalesce(F.col("_value"), F.lit(0.0))
    return (
        est.withColumn("priority", F.round(pr, 6))
        .orderBy(F.desc("priority"), "url")
        .limit(budget)
        .select("url", "priority", "p_changed", "lambda_per_day", "n_visits")
    )
