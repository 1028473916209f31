"""JsonCss-style schema extraction: selector engine + UDF surface."""

from crawl4ai_spark.extraction.markdown import parse_html
from crawl4ai_spark.extraction.schema_extract import extract_with_schema, select

CATALOG = """
<html><body>
  <div class="product card" id="p1">
    <h2 class="title">Widget <b>One</b></h2>
    <span class="price">$9.99</span>
    <a class="buy" href="/buy/1" rel="nofollow">buy</a>
    <div class="meta"><span class="sku">SKU-001</span></div>
  </div>
  <div class="product card" id="p2">
    <h2 class="title">Widget Two</h2>
    <span class="price">$19.50</span>
    <a class="buy" href="/buy/2">buy</a>
  </div>
  <div class="ad card"><h2 class="title">not a product</h2></div>
</body></html>
"""

SCHEMA = {
    "baseSelector": "div.product",
    "fields": [
        {"name": "title", "selector": "h2.title", "type": "text"},
        {"name": "price", "selector": "span.price", "type": "regex", "pattern": r"\$([\d.]+)"},
        {"name": "link", "selector": "a.buy", "type": "attribute", "attribute": "href"},
        {"name": "sku", "selector": "div.meta > span.sku", "type": "text", "default": "none",
         "transform": "lower"},
    ],
}


def test_selector_engine():
    root = parse_html(CATALOG)
    assert len(select(root, "div.product")) == 2
    assert len(select(root, "div.card")) == 3
    assert len(select(root, "#p2")) == 1
    assert len(select(root, "div.product > h2.title")) == 2
    assert len(select(root, "a[rel=nofollow]")) == 1
    assert len(select(root, "a[href]")) == 2
    assert len(select(root, "#p1 span.sku")) == 1
    assert len(select(root, "#p1, #p2")) == 2


def test_extract_with_schema():
    records = extract_with_schema(CATALOG, SCHEMA)
    assert records == [
        {"title": "Widget One", "price": "9.99", "link": "/buy/1", "sku": "sku-001"},
        {"title": "Widget Two", "price": "19.50", "link": "/buy/2", "sku": "none"},
    ]


def test_schema_udf(spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.extraction.schema_extract import schema_extract_udf

    df = spark.createDataFrame([(1, CATALOG.encode()), (2, None), (3, b"<p>no match</p>")],
                               "page_id long, html binary")
    udf = schema_extract_udf(SCHEMA)
    rows = (
        df.select("page_id", F.explode(udf("html")).alias("rec"))
        .select("page_id", F.col("rec")["title"].alias("title"), F.col("rec")["price"].alias("price"))
        .collect()
    )
    got = {(r.page_id, r.title, r.price) for r in rows}
    assert got == {(1, "Widget One", "9.99"), (1, "Widget Two", "19.50")}
