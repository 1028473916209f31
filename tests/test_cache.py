"""Cache semantics: CacheMode gating + head-fingerprint revalidation."""

from pyspark.sql import functions as F

from crawl4ai_spark.operators.cache import (
    CacheMode,
    head_fingerprint_col,
    revalidate,
    should_read_cache,
    should_write_cache,
    split_wave_by_cache,
)


def test_cache_mode_gating_truth_table():
    M = CacheMode
    assert should_read_cache(M.ENABLED) and should_write_cache(M.ENABLED)
    assert should_read_cache(M.READ_ONLY) and not should_write_cache(M.READ_ONLY)
    assert not should_read_cache(M.WRITE_ONLY) and should_write_cache(M.WRITE_ONLY)
    assert not should_read_cache(M.DISABLED) and not should_write_cache(M.DISABLED)
    assert not should_read_cache(M.BYPASS) and not should_write_cache(M.BYPASS)
    # raw: URLs never cacheable (cache_context.py:56)
    assert not should_read_cache(M.ENABLED, "raw://x")
    assert not should_write_cache(M.ENABLED, "raw://x")


def _page(title, desc="d"):
    return (
        f'<html><head><title>{title}</title>'
        f'<meta name="description" content="{desc}"></head>'
        f"<body><p>body text that can change freely</p></body></html>"
    )


def test_head_fingerprint_ignores_body_changes(spark):
    rows = [
        ("u1", _page("Same Title")),
        ("u2", _page("Same Title").replace("body text", "different body")),
        ("u3", _page("Other Title")),
        ("u4", "<html><head></head><body>no signals</body></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    fps = {
        r.url: r.fp
        for r in df.select("url", head_fingerprint_col(F.col("html")).alias("fp")).collect()
    }
    assert fps["u1"] == fps["u2"]          # body-only change → same fingerprint
    assert fps["u1"] != fps["u3"]          # title change → different
    assert fps["u4"] is None               # no signals → cannot validate


def test_revalidate_three_way_split(spark):
    cached = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", None), ("gone", 9)],
        "url string, head_fingerprint long",
    )
    current = spark.createDataFrame(
        [("a", 1), ("b", 22), ("c", 3), ("brand-new", 4)],
        "url string, head_fingerprint long",
    )
    got = {r.url: r.cache_status for r in revalidate(cached, current).collect()}
    assert got == {
        "a": "fresh",       # fingerprint unchanged
        "b": "stale",       # fingerprint changed
        "c": "stale",       # cached side unvalidatable → refetch
        "gone": "stale",    # vanished from current snapshot
        "brand-new": "new",
    }


def test_split_wave_by_cache_modes(spark):
    wave = spark.createDataFrame([("a",), ("b",), ("x",)], "url string")
    results = spark.createDataFrame([("a",), ("b",)], "url string")
    hits, misses = split_wave_by_cache(wave, results, CacheMode.ENABLED)
    assert {r.url for r in hits.collect()} == {"a", "b"}
    assert {r.url for r in misses.collect()} == {"x"}
    hits2, misses2 = split_wave_by_cache(wave, results, CacheMode.WRITE_ONLY)
    assert hits2.count() == 0 and misses2.count() == 3


def test_split_wave_by_cache_excludes_throttled_and_missing(spark):
    """Throttled rows stay pending in the crawl loop (bfs.run_crawl writes
    them to results but excludes them from attempted_keys) — the cache
    split must mirror that filter, or a throttled-only URL gated through
    CacheMode.ENABLED would be classed a hit and never fetched. 'missing'
    rows carry no cached content either."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.cache import CacheMode, split_wave_by_cache

    wave = spark.createDataFrame(
        [("http://a.com/1",), ("http://a.com/2",), ("http://a.com/3",), ("http://a.com/4",)],
        "url string",
    )
    results = spark.createDataFrame(
        [("http://a.com/1", "fetched"), ("http://a.com/2", "throttled"),
         ("http://a.com/3", "missing")],
        "url string, status string",
    )
    hits, misses = split_wave_by_cache(wave, results, CacheMode.ENABLED)
    assert {r.url for r in hits.collect()} == {"http://a.com/1"}
    assert {r.url for r in misses.collect()} == {
        "http://a.com/2", "http://a.com/3", "http://a.com/4"
    }
