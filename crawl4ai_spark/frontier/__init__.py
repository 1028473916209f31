from crawl4ai_spark.frontier.store import WaveStore  # noqa: F401
from crawl4ai_spark.frontier.bfs import CrawlConfig, run_crawl  # noqa: F401
