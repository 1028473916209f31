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
