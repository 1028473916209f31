"""MemoryAdaptiveGovernor — wave-size analog of the reference's
MemoryAdaptiveDispatcher (async_dispatcher.py:148-208): shrink/hold/grow
hysteresis, critical-pressure wait + timeout, and the crawl-level
invariant that a governed crawl fetches the same URL-seen set."""

import os

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.dispatch import (
    MemoryAdaptiveGovernor,
    executor_storage_percent,
    system_memory_percent,
)

from tests.conftest import spark, site, site_dir  # noqa: F401


def _gov(seq, **kw):
    it = iter(seq)
    return MemoryAdaptiveGovernor(memory_percent_fn=lambda: next(it), **kw)


def test_cap_shrinks_under_pressure_floors_at_min():
    g = _gov([92.0, 92.0, 92.0, 92.0], max_wave_rows=1000, min_wave_rows=200, shrink=0.5)
    caps = [g.next_wave_cap() for _ in range(4)]
    assert caps == [500, 250, 200, 200]
    assert g.memory_pressure_mode


def test_cap_holds_in_hysteresis_band_and_regrows_on_recovery():
    g = _gov(
        [92.0, 87.0, 80.0, 80.0, 80.0],
        max_wave_rows=1000,
        min_wave_rows=100,
        shrink=0.5,
        grow=2.0,
    )
    assert g.next_wave_cap() == 500      # pressure: shrink
    assert g.next_wave_cap() == 500      # 85 < 87 < 90: hold (hysteresis)
    assert g.next_wave_cap() == 1000     # recovery: grow
    assert not g.memory_pressure_mode    # cap back at max -> pressure cleared
    assert g.next_wave_cap() == 1000     # capped at max_wave_rows


def test_wait_if_critical_polls_until_subcritical():
    g = _gov([96.0, 97.0, 80.0], check_interval=0.01)
    assert g.wait_if_critical() == 80.0


def test_wait_if_critical_times_out_with_memory_error():
    g = _gov([96.0] * 1000, check_interval=0.01, memory_wait_timeout=0.05)
    with pytest.raises(MemoryError):
        g.wait_if_critical()


def test_sustained_pressure_above_threshold_times_out():
    """The reference raises after memory_wait_timeout seconds above
    memory_threshold_percent (90) — a crawl pinned at 92% (below
    critical) must still time out at a later sample."""
    import time

    g = _gov([92.0] * 10, check_interval=0.01, memory_wait_timeout=0.05)
    g.next_wave_cap()            # clock starts
    time.sleep(0.06)
    with pytest.raises(MemoryError):
        g.next_wave_cap()


def test_pressure_clock_resets_below_threshold():
    import time

    g = _gov([92.0, 80.0, 92.0, 92.0], check_interval=0.01, memory_wait_timeout=0.05)
    g.next_wave_cap()            # 92: clock starts
    time.sleep(0.06)
    g.next_wave_cap()            # 80: resets (no raise despite elapsed > timeout)
    g.next_wave_cap()            # 92: clock restarts
    g.next_wave_cap()            # 92 again immediately: well under timeout
    assert g.last_memory_percent == 92.0


def test_default_signals_sane(spark):  # noqa: F811
    pct = system_memory_percent()
    assert 0.0 < pct < 100.0
    stor = executor_storage_percent(spark)
    assert 0.0 <= stor < 100.0


def test_governed_crawl_same_seen_set_more_waves(spark, site_dir, tmp_path):  # noqa: F811
    """A cap-forced governor slices the crawl into smaller waves but must
    fetch exactly the same final URL-seen set (capacity trim keeps
    unselected rows pending — no URL lost, none attempted twice)."""
    from crawl4ai_spark.frontier.bfs import CrawlConfig, run_crawl
    from crawl4ai_spark.frontier.store import WaveStore

    pages = spark.read.parquet(os.path.join(site_dir, "pages.parquet"))
    seeds = spark.read.parquet(os.path.join(site_dir, "seeds.parquet"))

    free = run_crawl(
        spark, pages, seeds, str(tmp_path / "free"), CrawlConfig(max_depth=2, max_waves=20)
    )
    gov = MemoryAdaptiveGovernor(
        memory_percent_fn=lambda: 92.0,  # permanent pressure
        max_wave_rows=8,
        min_wave_rows=4,
        shrink=0.5,
    )
    capped = run_crawl(
        spark,
        pages,
        seeds,
        str(tmp_path / "gov"),
        CrawlConfig(max_depth=2, max_waves=50, memory_governor=gov),
    )

    def seen(d):
        t = WaveStore(spark, d).read_table("results")
        return {r.url for r in t.select("url").collect()}

    assert seen(str(tmp_path / "free")) == seen(str(tmp_path / "gov"))
    assert capped["total_attempted"] == free["total_attempted"]
    # every governed wave respected the cap
    res = WaveStore(spark, str(tmp_path / "gov")).read_table("results")
    per_wave = res.groupBy("wave").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= 8 for r in per_wave)
    assert len(per_wave) > len(free["waves"])  # sliced into more waves
