"""Seed sources: sitemap parsing (incl. gzip + nested index), robots
Sitemap: discovery, CC-style scans, raw inputs."""

import gzip

from pyspark.sql import functions as F

URLSET = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://s.com/a</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc>http://s.com/b</loc></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://s.com/sm1.xml</loc></sitemap>
  <sitemap><loc>http://s.com/sm2.xml.gz</loc></sitemap>
</sitemapindex>"""

URLSET2 = URLSET.replace("/a", "/c").replace("/b", "/d")


def test_parse_sitemap_variants():
    from crawl4ai_spark.sources.sitemap import parse_sitemap_urls

    kind, locs = parse_sitemap_urls(URLSET)
    assert kind == "urlset" and locs == ["http://s.com/a", "http://s.com/b"]
    kind, locs = parse_sitemap_urls(INDEX)
    assert kind == "index" and len(locs) == 2
    kind, locs = parse_sitemap_urls(gzip.compress(URLSET.encode()))
    assert kind == "urlset" and len(locs) == 2
    assert parse_sitemap_urls("<html>not a sitemap</html>")[0] == "invalid"
    assert parse_sitemap_urls(None)[0] == "invalid"


def test_sitemap_from_robots(spark):
    from crawl4ai_spark.sources.sitemap import sitemap_urls_from_robots

    robots = spark.createDataFrame(
        [
            ("s.com", "User-agent: *\nDisallow: /x\nSitemap: http://s.com/sm.xml\nsitemap: http://s.com/sm2.xml\n"),
            ("t.com", "User-agent: *\nAllow: /\n"),
        ],
        "host string, rules_text string",
    )
    got = {(r.host, r.sitemap_url) for r in sitemap_urls_from_robots(robots).collect()}
    assert got == {("s.com", "http://s.com/sm.xml"), ("s.com", "http://s.com/sm2.xml")}


def test_expand_nested_sitemaps(spark):
    from crawl4ai_spark.sources.sitemap import expand_sitemaps

    bodies = spark.createDataFrame(
        [
            ("http://s.com/sitemap.xml", INDEX.encode()),
            ("http://s.com/sm1.xml", URLSET.encode()),
            ("http://s.com/sm2.xml.gz", gzip.compress(URLSET2.encode())),
        ],
        "url string, body binary",
    )
    pages = expand_sitemaps(bodies)
    got = {r.url for r in pages.collect()}
    assert got == {"http://s.com/a", "http://s.com/b", "http://s.com/c", "http://s.com/d"}


def test_seed_urls_from_pages_glob(spark, site_dir):
    import os

    from crawl4ai_spark.sources.seeds import seed_urls_from_pages

    pages = spark.read.parquet(os.path.join(site_dir, "pages.parquet"))
    seeds = seed_urls_from_pages(pages, domain_glob="site1.com")
    hosts = {r.url.split("/")[2] for r in seeds.collect()}
    assert hosts == {"site1.com"}


def test_raw_html_source_runs_through_extraction(spark):
    from crawl4ai_spark.extraction.udfs import udf_full_extract
    from crawl4ai_spark.sources.seeds import raw_html_source

    df = raw_html_source(spark, [("raw://one", "<h1>Hi</h1><p>there</p>")])
    row = df.select(udf_full_extract("html", "url").alias("e")).head()
    assert row.e.markdown.raw_markdown == "# Hi\nthere\n"


def test_domain_map_union_dedup(spark, site_dir):
    """8-source domain mapper shape: union of homepage + cc scan + robots
    sitemap pointers + sitemap bodies, first-wins by source priority."""
    import os

    from crawl4ai_spark.sources.seeds import domain_map_seeds

    pages = spark.read.parquet(os.path.join(site_dir, "pages.parquet"))
    robots = spark.createDataFrame(
        [("site0.com", "User-agent: *\nSitemap: http://site0.com/sm.xml\n")],
        "host string, rules_text string",
    )
    bodies = spark.createDataFrame(
        [(
            "http://site0.com/sm.xml",
            '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<url><loc>http://site0.com/only-in-sitemap</loc></url>"
            "<url><loc>http://site0.com/</loc></url></urlset>".encode(),
        )],
        "url string, body binary",
    )
    got = domain_map_seeds(spark, ["site0.com"], pages=pages, robots=robots, sitemap_bodies=bodies)
    rows = {r.url: r.source for r in got.collect()}
    # homepage wins over cc/sitemap for the root (highest priority)
    assert rows["http://site0.com/"] == "homepage"
    # cc-index covers crawled pages
    assert rows["http://site0.com/cat0/"] == "cc_index"
    # sitemap-only URL comes from the sitemap expansion
    assert rows["http://site0.com/only-in-sitemap"] == "sitemap"
    assert rows["http://site0.com/sm.xml"] == "robots_sitemap"
    # dedup: one row per url
    assert got.count() == got.select("url").distinct().count()
