"""Crawl-cache semantics: CacheMode gating + smart revalidation.

Ports the reference's cache surface to the table-backed model:

- ``CacheMode`` + read/write gating — ``crawl4ai/cache_context.py:4-87``
  (ENABLED/DISABLED/READ_ONLY/WRITE_ONLY/BYPASS; raw: URLs never cached).
- Head-fingerprint change detection — ``crawl4ai/cache_validator.py`` /
  ``async_webcrawler.py:279-321``: on revisit, a page whose head
  fingerprint is unchanged is served from cache; a changed fingerprint
  invalidates the cached row (MERGE-on-hash-inequality in Iceberg terms).

The cache IS the ``results`` table (SURVEY §1.5): reading = join against
it before the fetch wave; writing = the per-wave append. ``revalidate``
below computes the three-way split {fresh, stale, new} entirely with one
join + native fingerprint comparison.
"""

from __future__ import annotations

from enum import Enum

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from crawl4ai_spark.extraction.meta import head_fingerprint_text


class CacheMode(Enum):
    ENABLED = "enabled"
    DISABLED = "disabled"
    READ_ONLY = "read_only"
    WRITE_ONLY = "write_only"
    BYPASS = "bypass"


def should_read_cache(mode: CacheMode, url: str = "", always_bypass: bool = False) -> bool:
    """cache_context.py:59-75 — raw: URLs are never cacheable."""
    if always_bypass or url.startswith("raw:"):
        return False
    return mode in (CacheMode.ENABLED, CacheMode.READ_ONLY)


def should_write_cache(mode: CacheMode, url: str = "", always_bypass: bool = False) -> bool:
    """cache_context.py:77-87."""
    if always_bypass or url.startswith("raw:"):
        return False
    return mode in (CacheMode.ENABLED, CacheMode.WRITE_ONLY)


@pandas_udf(StringType())
def udf_head_signals(html: pd.Series) -> pd.Series:
    """'|'-joined head change signals (empty → no fingerprint)."""

    def one(h) -> str:
        if h is None:
            return ""
        if isinstance(h, (bytes, bytearray)):
            h = bytes(h).decode("utf-8", errors="replace")
        return head_fingerprint_text(h)

    return pd.Series([one(h) for h in html])


def head_fingerprint_col(html_col) -> F.Column:
    """Nullable int64 head fingerprint: xxhash64 of the signal string,
    NULL when the page exposes no change signals (reference returns ""
    and treats it as 'cannot validate' → always refetch)."""
    signals = udf_head_signals(html_col)
    return F.when(signals != "", F.xxhash64(signals))


def revalidate(
    cached: DataFrame,
    current: DataFrame,
    url_col: str = "url",
    fp_col: str = "head_fingerprint",
) -> DataFrame:
    """Three-way cache validation split over a full outer join:

    - ``fresh``: cached and the head fingerprint is unchanged → serve
      from cache, skip the fetch/extract pipeline;
    - ``stale``: cached but the fingerprint differs or either side can't
      be validated (NULL fingerprint — the reference refetches when no
      signals exist) → refetch and MERGE over the cached row;
    - ``new``: no cached row → fetch.

    One shuffle (the join on url); fingerprint comparison is native.
    """
    c = cached.select(
        F.col(url_col).alias("url"),
        F.col(fp_col).alias("cached_fp"),
        F.lit(True).alias("_in_cache"),
    )
    n = current.select(
        F.col(url_col).alias("url"),
        F.col(fp_col).alias("current_fp"),
        F.lit(True).alias("_in_current"),
    )
    joined = c.join(n, "url", "full")
    in_cache = F.coalesce(F.col("_in_cache"), F.lit(False))
    status = (
        F.when(~in_cache, F.lit("new"))
        .when(
            F.col("cached_fp").isNotNull()
            & F.col("current_fp").isNotNull()
            & (F.col("cached_fp") == F.col("current_fp")),
            F.lit("fresh"),
        )
        .otherwise(F.lit("stale"))
    )
    return (
        joined.withColumn("cache_status", status).drop("_in_cache", "_in_current")
    )


def split_wave_by_cache(
    wave: DataFrame,
    results: DataFrame | None,
    mode: CacheMode = CacheMode.ENABLED,
    url_col: str = "url",
) -> tuple[DataFrame, DataFrame]:
    """(cache_hits, to_fetch) for a frontier wave — the reference's
    cache-read step (async_webcrawler.py:275-276) as a left-semi /
    left-anti pair against the results table; read gating per CacheMode."""
    if results is None or not should_read_cache(mode):
        return wave.limit(0), wave
    # Only *materialized* rows are hits: the crawl loop records 'throttled'
    # rows while keeping those URLs pending (bfs.run_crawl excludes them
    # from attempted_keys), and 'missing' rows carry no cached content —
    # classifying either as a hit would mean the URL is never fetched.
    if "status" in results.columns:
        results = results.where(~F.col("status").isin("throttled", "missing"))
    keys = results.select(url_col).distinct()
    hits = wave.join(keys, url_col, "left_semi")
    misses = wave.join(keys, url_col, "left_anti")
    return hits, misses
