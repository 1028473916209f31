"""Content filters (pruning fit_markdown, BM25 blocks) + head scorers."""

from pyspark.sql import functions as F

NOISY_PAGE = """<html lang="en"><head><title>Spark frontier crawling guide</title>
<meta name="description" content="deep guide to frontier crawling with spark">
</head><body>
<nav class="nav-menu"><a href="/a">home</a> <a href="/b">about</a> <a href="/c">contact</a></nav>
<article class="main-content">
<h1>Frontier crawling</h1>
<p>Frontier crawling with spark distributes the crawl frontier across many
executors and keeps politeness budgets per host while the wave iterates over
the pending urls and commits checkpoints atomically for resume safety.</p>
<p>A second substantial paragraph about spark crawling internals that carries
real content about frontier scheduling and deduplication of urls at scale.</p>
</article>
<footer class="footer"><a href="/x">terms</a> <a href="/y">privacy</a></footer>
</body></html>"""


def test_pruning_filter_drops_boilerplate():
    from crawl4ai_spark.extraction.content_filter import fit_markdown

    fit = fit_markdown(NOISY_PAGE)
    assert "Frontier crawling" in fit
    assert "substantial paragraph" in fit
    # nav/footer link farms pruned
    assert "contact" not in fit
    assert "privacy" not in fit


def test_pruning_keeps_everything_at_zero_threshold():
    from crawl4ai_spark.extraction.content_filter import fit_markdown

    full = fit_markdown(NOISY_PAGE, threshold=0.0)
    assert "privacy" in full and "contact" in full


def test_bm25_blocks_rank_relevant_content():
    from crawl4ai_spark.extraction.content_filter import bm25_fit_blocks

    blocks = bm25_fit_blocks(NOISY_PAGE, threshold=0.5)
    joined = " ".join(blocks)
    assert "Frontier crawling with spark" in joined
    # nav anchors are not blocks (only p/li/h*/blockquote/pre), so absent
    assert "contact" not in joined


def test_head_scorers(spark):
    from crawl4ai_spark.operators.head import head_relevance_score, seo_score

    rows = [
        (1, "http://a.com/spark/guide", "Spark frontier crawling guide",
         "deep guide to frontier crawling", "spark,crawl"),
        (2, "http://a.com/x?session=123_abc" + "y" * 80, "", "", ""),
    ]
    df = spark.createDataFrame(rows, "id long, url string, title string, description string, keywords string")
    out = df.select(
        "id",
        head_relevance_score(F.col("title"), F.col("description"), F.col("keywords"), ["spark", "frontier"]).alias("rel"),
        seo_score(F.col("url"), F.col("title"), F.col("description"), ["spark"]).alias("seo"),
    ).collect()
    by_id = {r.id: r for r in out}
    assert by_id[1].rel == 0.75  # (2*3 + 1*2 + 1*1) / 12
    assert by_id[2].rel == 0.0
    assert by_id[1].seo > 0.65   # passes the SEO threshold
    assert by_id[2].seo < 0.3    # long url + query + underscore multipliers
