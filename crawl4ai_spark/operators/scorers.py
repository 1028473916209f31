"""URL scorers — best-first frontier priorities as Column expressions.

Semantic contract: ``crawl4ai/deep_crawling/scorers.py`` — weighted
URLScorer protocol (:63-89), KeywordRelevanceScorer (:160-188),
PathDepthScorer distance table (:190-245), ContentTypeScorer (:247-330),
FreshnessScorer year-regex table (:332-412), DomainAuthorityScorer map
(:414-519), CompositeScorer sum (:91-158).

Every scorer compiles to a pure Column (JVM-side); the composite plugs
into the frontier's discovery step so best-first ordering costs nothing
beyond the expressions. The reference's per-URL lru_caches are obsolete
under vectorization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawl4ai_spark.functions.urlnorm import host_col
from crawl4ai_spark.operators.filters import url_extension_col


def keyword_relevance_scorer(keywords: list[str], weight: float = 1.0):
    """fraction-of-keywords-present (case-insensitive substring on url)."""
    lowered = [k.lower() for k in keywords]

    def build(url_col: Column) -> Column:
        if not lowered:
            return F.lit(0.0)
        low = F.lower(url_col)
        hits = sum((low.contains(k)).cast("int") for k in lowered)
        return (hits / F.lit(float(len(lowered)))) * weight

    return build


# PathDepthScorer lookup for |depth − optimal| (scorers.py:190-245).
_DEPTH_TABLE = (1.0, 0.5, 1.0 / 3.0, 0.25)


def path_depth_col(url_col: Column) -> Column:
    """Number of non-empty path segments."""
    path = F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit(""))
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    return F.size(segs)


def path_depth_scorer(optimal_depth: int = 3, weight: float = 1.0):
    def build(url_col: Column) -> Column:
        dist = F.abs(path_depth_col(url_col) - F.lit(optimal_depth))
        score = (
            F.when(dist == 0, _DEPTH_TABLE[0])
            .when(dist == 1, _DEPTH_TABLE[1])
            .when(dist == 2, _DEPTH_TABLE[2])
            .when(dist == 3, _DEPTH_TABLE[3])
            .otherwise(F.lit(1.0) / (F.lit(1.0) + dist))
        )
        return score * weight

    return build


def content_type_scorer(type_weights: dict[str, float], weight: float = 1.0):
    """extension → weight map (default 0 for unknown)."""

    def build(url_col: Column) -> Column:
        ext = url_extension_col(url_col)
        expr = F.lit(0.0)
        score = None
        for e, w in sorted(type_weights.items()):
            cond = ext == e.lower().lstrip(".")
            score = F.when(cond, w) if score is None else score.when(cond, w)
        score = expr if score is None else score.otherwise(0.0)
        return score * weight

    return build


# FreshnessScorer date pattern + year table (scorers.py:352-412): year with
# optional month/day groups; finditer is non-overlapping, so consumed
# month/day digits can hide a following year — kept for exact parity.
_YEAR_RE = r"(?:/|[-_])((?:19|20)\d{2})(?:(?:/|[-_])\d{2}(?:(?:/|[-_])\d{2})?)?"
_FRESHNESS_TABLE = (1.0, 0.9, 0.8, 0.7, 0.6, 0.5)


def freshness_scorer(current_year: int = 2026, weight: float = 1.0):
    def build(url_col: Column) -> Column:
        # reference (deep_crawling/scorers.py:377-391): findall all year
        # candidates, keep the most recent one that is <= current_year;
        # future-dated / no-year URLs fall back to the 0.5 default
        years = F.transform(
            F.regexp_extract_all(url_col, F.lit(_YEAR_RE), F.lit(1)),
            lambda y: y.cast("int"),
        )
        valid = F.filter(years, lambda y: y <= F.lit(current_year))
        year = F.when(F.size(valid) > 0, F.array_max(valid))
        diff = F.lit(current_year) - year
        table = (
            F.when(diff == 0, _FRESHNESS_TABLE[0])
            .when(diff == 1, _FRESHNESS_TABLE[1])
            .when(diff == 2, _FRESHNESS_TABLE[2])
            .when(diff == 3, _FRESHNESS_TABLE[3])
            .when(diff == 4, _FRESHNESS_TABLE[4])
            .when(diff == 5, _FRESHNESS_TABLE[5])
            .otherwise(F.greatest(F.lit(0.1), F.lit(1.0) - diff * 0.1))
        )
        return F.when(year.isNull(), F.lit(0.5)).otherwise(table) * weight

    return build


def domain_authority_scorer(
    domain_weights: dict[str, float], default_weight: float = 0.5, weight: float = 1.0
):
    def build(url_col: Column) -> Column:
        host = host_col(url_col)
        score = None
        for d, w in sorted(domain_weights.items()):
            cond = (host == d.lower()) | host.endswith("." + d.lower())
            score = F.when(cond, w) if score is None else score.when(cond, w)
        score = F.lit(default_weight) if score is None else score.otherwise(default_weight)
        return score * weight

    return build


def composite_scorer(*scorers, normalize: bool = False):
    """Sum of pre-weighted child scores (÷ count when normalize)."""

    def build(url_col: Column) -> Column:
        total = F.lit(0.0)
        for s in scorers:
            total = total + s(url_col)
        if normalize and scorers:
            total = total / F.lit(float(len(scorers)))
        return total

    return build


def anchor_keyword_scorer(keywords: list[str], weight: float = 1.0, url_weight: float = 0.3):
    """Anchor-context relevance: fraction of keywords present in the
    anchor text/title (weighted 1−url_weight) plus in the URL
    (url_weight) — the frontier analog of the reference's link
    total-score blend (utils.py:3459-3504) with anchor context as the
    dominant signal. Signature matches CrawlConfig.text_scorer."""
    if not keywords:
        raise ValueError("anchor_keyword_scorer requires at least one keyword")
    lowered = [k.lower() for k in keywords]

    def frac(hay: Column) -> Column:
        hits = [
            F.when(F.instr(hay, F.lit(k)) > 0, 1).otherwise(0) for k in lowered
        ]
        total = hits[0]
        for h in hits[1:]:
            total = total + h
        return total / F.lit(float(len(lowered)))

    def build(url_col: Column, text_col: Column, title_col: Column) -> Column:
        anchor = F.lower(
            F.concat_ws(" ", F.coalesce(text_col, F.lit("")), F.coalesce(title_col, F.lit("")))
        )
        return (
            frac(anchor) * (1.0 - url_weight) + frac(F.lower(url_col)) * url_weight
        ) * weight

    return build
