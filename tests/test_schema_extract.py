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


NESTED_HTML = """
<div class="product" data-sku="A1">
  <h2 class="title">Widget <b>Pro</b></h2>
  <div class="vendor"><span class="vname">Acme Corp</span><span class="vid">v-9</span></div>
  <ul class="tags"><li class="tag">new</li><li class="tag">sale</li></ul>
  <div class="offer"><span class="price">$10.50</span><span class="ship">fast</span></div>
  <div class="offer"><span class="price">$9.99</span><span class="ship">slow</span></div>
</div>
<div class="product" data-sku="B2">
  <h2 class="title">Gadget</h2>
  <div class="vendor"><span class="vname">Globex</span><span class="vid">v-3</span></div>
  <ul class="tags"><li class="tag">used</li></ul>
</div>
"""

NESTED_SCHEMA = {
    "baseSelector": "div.product",
    "baseFields": [{"name": "sku", "type": "attribute", "attribute": "data-sku"}],
    "fields": [
        {"name": "title", "selector": "h2.title", "type": "text"},
        {
            "name": "vendor",
            "type": "nested",
            "selector": "div.vendor",
            "fields": [
                {"name": "vname", "selector": ".vname", "type": "text"},
                {"name": "vid", "selector": ".vid", "type": "text"},
            ],
        },
        {
            "name": "tags",
            "type": "list",
            "selector": "li.tag",
            "fields": [{"name": "tag", "type": "text"}],
        },
        {
            "name": "offers",
            "type": "nested_list",
            "selector": "div.offer",
            "fields": [
                {"name": "price", "selector": ".price", "type": ["text", "regex"],
                 "pattern": r"\$([\d.]+)"},
                {"name": "ship", "selector": ".ship", "type": "text",
                 "transform": "uppercase"},
            ],
        },
        {"name": "missing", "selector": ".nope", "type": "text", "default": "n/a"},
    ],
}


def test_nested_schema_extraction():
    from crawl4ai_spark.extraction.schema_extract import extract_with_schema

    recs = extract_with_schema(NESTED_HTML, NESTED_SCHEMA)
    assert len(recs) == 2
    a = recs[0]
    assert a["sku"] == "A1"
    assert a["title"] == "Widget Pro"
    assert a["vendor"] == {"vname": "Acme Corp", "vid": "v-9"}
    assert a["tags"] == [{"tag": "new"}, {"tag": "sale"}]
    assert a["offers"] == [
        {"price": "10.50", "ship": "FAST"},
        {"price": "9.99", "ship": "SLOW"},
    ]
    assert a["missing"] == "n/a"
    b = recs[1]
    assert b["vendor"]["vname"] == "Globex"
    assert b["offers"] == []  # no matches -> empty nested_list


def test_computed_field_local_api():
    from crawl4ai_spark.extraction.schema_extract import extract_with_schema

    schema = {
        "baseSelector": "div.product",
        "fields": [
            {"name": "title", "selector": "h2.title", "type": "text"},
            {"name": "shout", "type": "computed",
             "function": lambda item: item["title"].upper()},
        ],
    }
    recs = extract_with_schema(NESTED_HTML, schema)
    assert recs[0]["shout"] == "WIDGET PRO"


def test_xpath_engine_and_schema():
    from crawl4ai_spark.extraction.schema_extract import (
        extract_with_schema,
        xpath_select,
    )
    from crawl4ai_spark.extraction.markdown import parse_html

    root = parse_html(NESTED_HTML)
    prods = xpath_select(root, "//div[@class='product']")
    assert len(prods) == 2
    first_offer = xpath_select(prods[0], ".//div[@class='offer'][1]")
    assert len(first_offer) == 1
    spans = xpath_select(first_offer[0], "./span")
    assert [s.attrs.get("class") for s in spans] == ["price", "ship"]

    schema = {
        "baseSelector": "//div[@class='product']",
        "fields": [
            {"name": "title", "selector": ".//h2[@class='title']", "type": "text"},
            {
                "name": "offers",
                "type": "nested_list",
                "selector": ".//div[@class='offer']",
                "fields": [
                    {"name": "price", "selector": ".//span[@class='price']", "type": "text"},
                ],
            },
        ],
    }
    recs = extract_with_schema(NESTED_HTML, schema, engine="xpath")
    assert recs[0]["title"] == "Widget Pro"
    assert [o["price"] for o in recs[0]["offers"]] == ["$10.50", "$9.99"]


def test_schema_json_udf_nested(spark):
    import json

    from crawl4ai_spark.extraction.schema_extract import schema_extract_json_udf
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, NESTED_HTML)], "doc_id long, html string")
    udf = schema_extract_json_udf(NESTED_SCHEMA)
    rows = df.select(F.explode(udf("html")).alias("rec")).collect()
    recs = [json.loads(r.rec) for r in rows]
    assert recs[0]["vendor"]["vid"] == "v-9"
    assert recs[1]["sku"] == "B2"


def test_xpath_positional_predicate_per_parent():
    """Real XPath evaluates '//li[2]' per parent (lxml semantics): the
    second li within EACH parent ul, not the single second match in
    pooled document order."""
    from crawl4ai_spark.extraction.markdown import parse_html
    from crawl4ai_spark.extraction.schema_extract import xpath_select

    html = (
        "<div>"
        "<ul><li>a1</li><li>a2</li><li>a3</li></ul>"
        "<ul><li>b1</li><li>b2</li></ul>"
        "<ul><li>c1</li></ul>"
        "</div>"
    )
    root = parse_html(html, drop_tags=frozenset())

    def text(n):
        out = []

        def walk(x):
            if isinstance(x, str):
                out.append(x)
            else:
                for c in x.children:
                    walk(c)

        walk(n)
        return "".join(out)

    got = [text(n) for n in xpath_select(root, "//li[2]")]
    assert got == ["a2", "b2"]
    # attribute + positional chain: second li with the class, per parent
    html2 = (
        "<ul><li class='x'>p</li><li>skip</li><li class='x'>q</li></ul>"
        "<ul><li class='x'>r</li><li class='x'>s</li></ul>"
    )
    root2 = parse_html(html2, drop_tags=frozenset())
    got2 = [text(n) for n in xpath_select(root2, "//li[@class='x'][2]")]
    assert got2 == ["q", "s"]
