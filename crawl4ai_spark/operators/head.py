"""Head-based filters/scorers: SEO quality + content relevance.

Semantic contract: ``crawl4ai/deep_crawling/filters.py`` —
ContentRelevanceFilter (:502-578): BM25-simplified relevance of a query
against head signals (title ×3, description ×2, keywords ×1);
SEOFilter (:581-691): weighted head-quality score (title length/keyword,
meta description, canonical, robots-ok, structured data, URL-quality
multipliers: len>80 ×0.7, digits ×0.8, query ×0.6, underscores ×0.9),
default threshold 0.65.

Unlike the reference (live HeadPeekr fetch), head signals come from the
``pages.html`` column — the head struct is produced by ``udf_head_meta``
and the scores here are pure column algebra over it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _term_hits(text_col: Column, terms: list[str]) -> Column:
    low = F.lower(F.coalesce(text_col, F.lit("")))
    hits = F.lit(0)
    for t in terms:
        hits = hits + low.contains(t.lower()).cast("int")
    return hits


def head_relevance_score(
    title: Column, description: Column, keywords: Column, query_terms: list[str]
) -> Column:
    """Weighted head relevance in [0, 1]: fraction of query terms present,
    field-weighted title×3 / description×2 / keywords×1."""
    if not query_terms:
        return F.lit(0.0)
    n = float(len(query_terms))
    weighted = (
        3.0 * _term_hits(title, query_terms)
        + 2.0 * _term_hits(description, query_terms)
        + 1.0 * _term_hits(keywords, query_terms)
    )
    return F.round(F.least(weighted / F.lit(6.0 * n), F.lit(1.0)), 6)


def seo_score(
    url: Column, title: Column, description: Column, keywords: list[str] | None = None
) -> Column:
    """Head/URL SEO quality in [0, 1] (SEOFilter signal weights)."""
    title_len = F.length(F.coalesce(title, F.lit("")))
    base = (
        # title present with sane length (15-70 chars)
        F.when((title_len >= 15) & (title_len <= 70), 0.3)
        .when(title_len > 0, 0.15)
        .otherwise(0.0)
        # meta description present
        + F.when(F.length(F.coalesce(description, F.lit(""))) > 0, F.lit(0.3)).otherwise(0.0)
        # title carries a target keyword
        + (
            F.when(_term_hits(title, keywords or []) > 0, F.lit(0.2)).otherwise(0.0)
            if keywords
            else F.lit(0.2)  # no keyword spec → treat as satisfied
        )
        # robots-ok share (no live fetch: carried by the robots gate)
        + F.lit(0.2)
    )
    # URL-quality multipliers
    quality = F.lit(1.0)
    quality = quality * F.when(F.length(url) > 80, 0.7).otherwise(1.0)
    quality = quality * F.when(url.rlike(r"/[^/]*\d{4,}"), 0.8).otherwise(1.0)
    quality = quality * F.when(url.contains("?"), 0.6).otherwise(1.0)
    quality = quality * F.when(url.contains("_"), 0.9).otherwise(1.0)
    return F.round(F.least(base * quality, F.lit(1.0)), 6)


SEO_THRESHOLD = 0.65
