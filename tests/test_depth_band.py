"""Depth-band wave coalescing (CrawlConfig.depth_band): a banded crawl
must fetch EXACTLY the unbanded crawl's URL-seen set and attempted total
(each band step is an exact politeness wave), while committing the store
in ≤ ceil(waves / band) waves — the per-wave fixed-overhead amortization
for deep-narrow crawls (BENCH/WAVE_OVERHEAD.md, BENCH/DEEP_CRAWL.md)."""

import os

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.frontier.bfs import CrawlConfig, run_crawl
from crawl4ai_spark.frontier.store import WaveStore

from tests.conftest import spark, site, site_dir  # noqa: F401


def _seen(spark, d):  # noqa: F811
    t = WaveStore(spark, d).read_table("results")
    return {r.url for r in t.select("url").collect()}


def _crawl(spark, site_dir, out, **cfg):  # noqa: F811
    pages = spark.read.parquet(os.path.join(site_dir, "pages.parquet"))
    seeds = pages.select("url").orderBy("url").limit(3)
    return run_crawl(spark, pages, seeds, out, CrawlConfig(**cfg))


def test_depth_band_same_seen_set_fewer_commits(spark, site_dir, tmp_path):  # noqa: F811
    """Tight per-host budget forces a deep-narrow shape (many small
    waves); depth_band=4 must halve the committed wave count at identical
    final URL-seen set + attempted total."""
    base = dict(max_depth=4, max_waves=40, default_budget=2)
    free = _crawl(spark, site_dir, str(tmp_path / "free"), **base)
    banded = _crawl(spark, site_dir, str(tmp_path / "band"), depth_band=4, **base)

    assert _seen(spark, str(tmp_path / "free")) == _seen(spark, str(tmp_path / "band"))
    assert banded["total_attempted"] == free["total_attempted"]
    n_free = len(free["waves"])
    n_band = len(banded["waves"])
    assert n_band <= max(1, (n_free + 3) // 4), (n_free, n_band)
    assert n_band * 2 <= n_free  # the verdict's "≤ half the waves" bar
    # metrics rows reconcile: per-band n_attempted sums to the total
    m = WaveStore(spark, str(tmp_path / "band")).read_table("metrics")
    assert m.agg(F.sum("n_attempted")).collect()[0][0] == banded["total_attempted"]


def test_depth_band_max_waves_truncation_same_step_budget(spark, site_dir, tmp_path):  # noqa: F811
    """max_waves counts politeness STEPS, not committed bands: a banded
    crawl truncated by max_waves mid-frontier must select exactly the
    unbanded crawl's URL multiset (counting bands would hand it
    depth_band× the budget — the regression the deep-crawl bench's
    seen-set assertion caught)."""
    base = dict(max_depth=40, max_waves=6, default_budget=1)
    free = _crawl(spark, site_dir, str(tmp_path / "free"), **base)
    banded = _crawl(spark, site_dir, str(tmp_path / "band"), depth_band=3, **base)
    assert _seen(spark, str(tmp_path / "free")) == _seen(spark, str(tmp_path / "band"))
    assert banded["total_attempted"] == free["total_attempted"]
    assert len(banded["waves"]) <= 2  # 6 steps / band of 3
    assert sum(w["band_steps"] for w in banded["waves"]) <= 6


def test_depth_band_with_max_pages_cap(spark, site_dir, tmp_path):  # noqa: F811
    """The global max_pages cap applies per step exactly as per wave —
    the banded crawl attempts the same number of pages and never
    overshoots."""
    base = dict(max_depth=4, max_waves=40, default_budget=2, max_pages=11)
    free = _crawl(spark, site_dir, str(tmp_path / "free"), **base)
    banded = _crawl(spark, site_dir, str(tmp_path / "band"), depth_band=3, **base)
    assert free["total_attempted"] == 11
    assert banded["total_attempted"] == 11
    assert _seen(spark, str(tmp_path / "free")) == _seen(spark, str(tmp_path / "band"))


def test_depth_band_no_url_attempted_twice(spark, site_dir, tmp_path):  # noqa: F811
    """Intra-band discoveries dedup exactly against both committed state
    and the band's own deltas — no URL may be fetched twice even when a
    page is discovered at two depths inside one band."""
    _crawl(
        spark, site_dir, str(tmp_path / "band"),
        max_depth=4, max_waves=40, default_budget=3, depth_band=4,
    )
    res = WaveStore(spark, str(tmp_path / "band")).read_table("results")
    dupes = (
        res.where(F.col("status") != "throttled")
        .groupBy("url").count().where(F.col("count") > 1).count()
    )
    assert dupes == 0


def test_depth_band_resume_after_kill(spark, site_dir, tmp_path):  # noqa: F811
    """A banded store resumes like any other: killing after the first
    band and re-running completes the same URL-seen set as one
    uninterrupted banded crawl."""
    out = str(tmp_path / "band")
    base = dict(max_depth=4, default_budget=2, depth_band=3)
    # run only the first band, then "crash"
    _crawl(spark, site_dir, out, max_waves=1, **base)
    first = len(WaveStore(spark, out).committed_waves())
    assert first == 1
    # resume to completion
    _crawl(spark, site_dir, out, max_waves=40, **base)
    ref = _crawl(spark, site_dir, str(tmp_path / "ref"), max_waves=40,
                 max_depth=4, default_budget=2)
    assert _seen(spark, out) == _seen(spark, str(tmp_path / "ref"))
