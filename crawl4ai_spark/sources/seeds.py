"""Seed-list sources — the batch analogs of the reference's scan inputs.

- ``seed_urls_from_pages``: Common-Crawl-index-style discovery: project
  URLs out of a pages/index table filtered by a domain glob
  (``crawl4ai/async_url_seeder.py:829-882`` _from_cc → a filtered scan).
- ``raw_html_source``: the ``raw:`` input path — literal HTML snippets as
  a DataFrame (``crawl4ai/async_crawler_strategy.py:2594``).
- ``file://`` inputs are simply ``spark.read.text`` / binaryFile — no
  wrapper needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.functions.urlnorm import host_col


def seed_urls_from_pages(
    pages: DataFrame, domain_glob: str | None = None, limit: int | None = None
) -> DataFrame:
    """CC-index scan: url projection + host-glob pushdown filter."""
    df = pages.select("url")
    if domain_glob:
        # glob on the host (e.g. '*.example.com' or 'example.*')
        regex = "^" + domain_glob.replace(".", r"\.").replace("*", ".*") + "$"
        df = df.where(host_col(F.col("url")).rlike(regex))
    if limit:
        df = df.limit(limit)
    return df.withColumn("priority", F.lit(1.0))


def raw_html_source(spark: SparkSession, snippets: list[tuple[str, str]]) -> DataFrame:
    """raw: inputs — (url, html) literals as a pages-shaped DataFrame."""
    rows = [(url, html.encode("utf-8")) for url, html in snippets]
    return spark.createDataFrame(rows, "url string, html binary")


def homepage_seeds(spark: SparkSession, domains: list[str]) -> DataFrame:
    """Homepage guess per domain (the reference domain mapper's cheapest
    source, ``crawl4ai/domain_mapper.py:507-610``)."""
    rows = [(f"http://{d.strip().lower()}/",) for d in domains if d.strip()]
    return spark.createDataFrame(rows, "url string").withColumn("priority", F.lit(1.0))


def domain_map_seeds(
    spark: SparkSession,
    domains: list[str],
    pages: DataFrame | None = None,
    robots: DataFrame | None = None,
    sitemap_bodies: DataFrame | None = None,
) -> DataFrame:
    """Multi-source URL discovery union (reference ``domain_mapper.py:122-``
    scan): homepage guess + CC-index-style pages scan + robots ``Sitemap:``
    pointers + parsed sitemap bodies, deduped first-wins by source
    priority. The reference's five live sources (wayback, crt.sh, probe,
    feeds, head-crawl) need network I/O and are out of scope (SURVEY §2.1);
    the union/dedup shape is the same with sources as DataFrames.

    Returns (url, source, priority) — one row per distinct URL, keeping
    the highest-priority source that found it.
    """
    from crawl4ai_spark.sources.sitemap import expand_sitemaps, sitemap_urls_from_robots

    hosts = {d.strip().lower() for d in domains if d.strip()}
    parts: list[DataFrame] = [
        homepage_seeds(spark, sorted(hosts)).select(
            "url", F.lit("homepage").alias("source"), F.lit(3.0).alias("priority")
        )
    ]
    if pages is not None:
        cc = seed_urls_from_pages(pages).where(
            host_col(F.col("url")).isin(sorted(hosts))
        )
        parts.append(
            cc.select("url", F.lit("cc_index").alias("source"), F.lit(2.0).alias("priority"))
        )
    if robots is not None:
        pointers = sitemap_urls_from_robots(robots).where(F.col("host").isin(sorted(hosts)))
        sm_urls = pointers.select(F.col("sitemap_url").alias("url"))
        parts.append(
            sm_urls.select("url", F.lit("robots_sitemap").alias("source"), F.lit(1.5).alias("priority"))
        )
    if sitemap_bodies is not None:
        expanded = expand_sitemaps(sitemap_bodies)
        parts.append(
            expanded.select("url", F.lit("sitemap").alias("source"), F.lit(1.0).alias("priority"))
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    # first-wins by source priority then source name (deterministic)
    best = F.max_by(
        F.struct("source", "priority"), F.struct("priority", F.col("source"))
    )
    return (
        unioned.groupBy("url")
        .agg(best.alias("b"))
        .select("url", F.col("b.source").alias("source"), F.col("b.priority").alias("priority"))
    )
