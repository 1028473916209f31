from crawl4ai_spark.sources.sitemap import (  # noqa: F401
    parse_sitemap_urls,
    sitemap_urls_from_robots,
    udf_parse_sitemap,
)
from crawl4ai_spark.sources.seeds import seed_urls_from_pages, raw_html_source  # noqa: F401
