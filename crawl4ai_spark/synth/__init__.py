from crawl4ai_spark.synth.pages import generate_site, write_site_parquet  # noqa: F401
