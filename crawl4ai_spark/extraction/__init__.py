"""Pure-Python extraction library (no Spark imports).

The distributed analog of the reference's scraping + markdown stage
(``crawl4ai/content_scraping_strategy.py:101-1014``,
``crawl4ai/markdown_generation_strategy.py:55-260``, vendored html2text).
Everything here is deliberately dependency-free (stdlib ``html.parser``;
lxml is not available in this environment) so it can be shipped via
``spark-submit --py-files`` and executed inside Arrow-batched pandas UDFs.

The byte-level invariant surface: for every page in the synthetic corpus,
``html_to_markdown(html)`` must equal the page's golden ``text`` column
byte-for-byte (the corpus generator renders markdown → HTML, so the
converter must round-trip exactly).
"""

from crawl4ai_spark.extraction.links import extract_links  # noqa: F401
from crawl4ai_spark.extraction.markdown import html_to_markdown, generate_markdown_result  # noqa: F401
from crawl4ai_spark.extraction.meta import extract_head_meta, extract_lang  # noqa: F401
