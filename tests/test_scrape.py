"""Truth-table tests for the scraping battery (cleaned_html + media +
rich links) — one test per removal flag / scoring rule, mirroring the
reference's content-scraper suite shape
(tests/async/test_content_scraper_strategy.py)."""

from crawl4ai_spark.extraction.scrape import (
    link_intrinsic_score,
    extract_page_context,
    parse_srcset,
    scrape_page,
)

DOC = """<html><head><title>Spark Guide Manual</title>
<meta name="description" content="guide docs"></head><body>
<h1>Spark Guide</h1>
<nav class="menu"><a href="/docs/">docs</a></nav>
<div class="x" onclick="f()" style="color:red"><p data-q="1">Body paragraph with several words.</p></div>
<script>var x=1;</script>tail survives
<style>p{}</style><noscript>noscript junk</noscript>
<div></div><span>  </span>
<form action="/s"><input name="q"></form>
<em>keep em</em>
<a href="http://ext.org/p">ext link</a>
</body></html>"""


def test_cleaned_html_removes_script_style_noscript_keeps_tail():
    r = scrape_page(DOC, "http://site.com/")
    c = r["cleaned_html"]
    assert "var x=1" not in c and "<style>" not in c and "noscript junk" not in c
    assert "tail survives" in c
    assert "Body paragraph with several words." in c


def test_cleaned_html_attribute_whitelist():
    r = scrape_page(DOC, "http://site.com/")
    c = r["cleaned_html"]
    assert "onclick" not in c and "style=" not in c and "data-q" not in c
    assert 'class="x"' in c  # class is an IMPORTANT_ATTR
    r2 = scrape_page(DOC, "http://site.com/", keep_data_attributes=True)
    assert 'data-q="1"' in r2["cleaned_html"]


def test_cleaned_html_prunes_empty_elements():
    r = scrape_page(DOC, "http://site.com/")
    assert "<div></div>" not in r["cleaned_html"]
    assert "<span>" not in r["cleaned_html"]  # whitespace-only span pruned


def test_pre_and_code_exempt_from_pruning():
    html = "<body><pre><span> </span>x = 1</pre><p>words here</p></body>"
    r = scrape_page(html, "http://site.com/")
    assert "<span> </span>" in r["cleaned_html"]


def test_excluded_tags_and_selector():
    r = scrape_page(DOC, "http://site.com/", excluded_tags=["nav"])
    assert "docs" not in r["cleaned_html"]
    r2 = scrape_page(DOC, "http://site.com/", excluded_selector=".x")
    assert "Body paragraph" not in r2["cleaned_html"]


def test_remove_forms_flag():
    keep = scrape_page(DOC, "http://site.com/")
    drop = scrape_page(DOC, "http://site.com/", remove_forms=True)
    assert "<form" in keep["cleaned_html"]
    assert "<form" not in drop["cleaned_html"]


def test_only_text_flattens_inline_tags():
    r = scrape_page(DOC, "http://site.com/", only_text=True)
    assert "<em>" not in r["cleaned_html"]
    assert "keep em" in r["cleaned_html"]


def test_css_selector_scoping():
    r = scrape_page(DOC, "http://site.com/", css_selector=".x")
    assert r["cleaned_html"].startswith("<div>")
    assert "Body paragraph" in r["cleaned_html"]
    assert "Spark Guide" not in r["cleaned_html"]
    # links still whole-page scope
    assert r["links"]["external"]


def test_exclude_external_links_removes_anchor():
    r = scrape_page(DOC, "http://site.com/", exclude_external_links=True)
    assert r["links"]["external"] == []
    assert "ext link" not in r["cleaned_html"]


def test_rich_link_struct_and_scoring():
    r = scrape_page(DOC, "http://site.com/", score_links=True)
    internal = {d["href"]: d for d in r["links"]["internal"]}
    link = internal["http://site.com/docs/"]
    assert link["base_domain"] == "site.com"
    assert link["intrinsic_score"] > 0
    ext = r["links"]["external"][0]
    assert ext["base_domain"] == "ext.org"


def test_base64_src_stripped():
    html = '<body><p>some words here</p><img src="data:image/png;base64,AAA" width="600" height="600" alt="big"></body>'
    r = scrape_page(html, "http://site.com/")
    assert "base64" not in r["cleaned_html"]


MEDIA_DOC = """<body>
<p>A descriptive paragraph about the product gallery with many words.</p>
<picture><source srcset="/i/a-800.webp 800w"><img src="/i/a.jpg" width="300" height="200" alt="hero" srcset="/i/a-2x.jpg 2x"></picture>
<img src="/icons/logo.png" width="500" height="500" alt="site logo">
<img src="/i/small.gif" width="20" height="20">
<img src="/i/last.png" width="400" height="400" alt="late image">
<video src="/v/clip.mp4"><source src="/v/clip.webm"></video>
<audio src="/a/pod.mp3"></audio>
</body>"""


def test_image_scoring_threshold_and_filters():
    r = scrape_page(MEDIA_DOC, "http://site.com/")
    srcs = {m["src"] for m in r["media"]["images"]}
    # hero: width+height+alt+position+format+srcset+picture = 7 -> kept
    assert "/i/a.jpg" in srcs
    # variants from srcset and picture source
    assert "/i/a-2x.jpg" in srcs and "/i/a-800.webp" in srcs
    # "logo" in src -> icon filter
    assert not any("logo" in s for s in srcs)
    # small gif: no alt, size<=150 -> score 2 (position+format) <= threshold
    assert "/i/small.gif" not in srcs
    hero = next(m for m in r["media"]["images"] if m["src"] == "/i/a.jpg")
    assert hero["score"] == 7 and hero["format"] == "jpg"
    assert hero["desc"] and "descriptive paragraph" in hero["desc"]


def test_image_position_rule():
    r = scrape_page(MEDIA_DOC, "http://site.com/")
    # last.png: width+height+alt+format = 4, but position 3/4 >= 0.5 (no bonus)
    late = next(m for m in r["media"]["images"] if m["src"] == "/i/last.png")
    assert late["score"] == 4


def test_video_audio_collection_with_sources():
    r = scrape_page(MEDIA_DOC, "http://site.com/")
    vids = {m["src"] for m in r["media"]["videos"]}
    assert vids == {"/v/clip.mp4", "/v/clip.webm"}
    auds = {m["src"] for m in r["media"]["audios"]}
    assert auds == {"/a/pod.mp3"}


def test_exclude_all_images():
    r = scrape_page(MEDIA_DOC, "http://site.com/", exclude_all_images=True)
    assert r["media"]["images"] == []
    assert "<img" not in r["cleaned_html"]


def test_mermaid_svg_to_fence():
    html = (
        '<body><p>Diagram below shows the flow clearly.</p>'
        '<svg id="mermaid-1" aria-roledescription="flowchart">'
        '<g class="nodeLabel">Start</g><g class="nodeLabel">End</g></svg></body>'
    )
    r = scrape_page(html, "http://site.com/")
    # data-language is stripped by the attribute whitelist (as in the
    # reference) unless keep_data_attributes is set
    assert '<pre><code class="language-mermaid">' in r["cleaned_html"]
    assert "Start" in r["cleaned_html"] and "End" in r["cleaned_html"]
    assert "<svg" not in r["cleaned_html"]
    r2 = scrape_page(html, "http://site.com/", keep_data_attributes=True)
    assert '<pre data-language="mermaid">' in r2["cleaned_html"]


def test_parse_srcset():
    assert parse_srcset("/a.jpg 800w, /b.jpg 2x , /c.jpg") == [
        {"url": "/a.jpg", "width": "800"},
        {"url": "/b.jpg", "width": "2x"},
        {"url": "/c.jpg", "width": None},
    ]


def test_intrinsic_score_bounds_and_signals():
    ctx = extract_page_context("Spark Guide", "Spark Guide", "docs", "http://docs.site.com/")
    hi = link_intrinsic_score(
        "spark api reference guide", "https://docs.site.com/docs/api/",
        "full reference", "nav-main", "next", ctx,
    )
    lo = link_intrinsic_score(
        "click here", "http://x.com/a/b/c/d/e/f/g/h", "", "ad-banner", "nofollow", ctx
    )
    assert 0.0 <= lo < hi <= 10.0


def test_link_total_score_fallback_ladder():
    from crawl4ai_spark.extraction.scrape import link_total_score

    assert link_total_score(9.0, 0.8, score_links_enabled=False) == 5.0
    assert link_total_score(9.0, None, True, query_provided=False) == 9.0
    assert link_total_score(12.0, None, True, query_provided=False) == 10.0  # clamp
    # both: 0.7*8 + 0.3*(0.5*10) = 7.1
    assert abs(link_total_score(8.0, 0.5, True, True) - 7.1) < 1e-9
    assert link_total_score(None, None, True, True) == 0.0


def test_exclude_social_media_links():
    html = ('<body><p>follow <a href="http://twitter.com/u">tw</a> and '
            '<a href="http://partner.org/x">partner</a></p></body>')
    keep = scrape_page(html, "http://site.com/")
    assert {d["base_domain"] for d in keep["links"]["external"]} == {"twitter.com", "partner.org"}
    drop = scrape_page(html, "http://site.com/", exclude_social_media_links=True)
    assert {d["base_domain"] for d in drop["links"]["external"]} == {"partner.org"}
    assert "twitter.com" not in drop["cleaned_html"]


def test_include_tables_in_media():
    html = (
        "<body><p>report follows with data table content words</p>"
        "<table><thead><tr><th>sku</th><th>price</th></tr></thead>"
        "<tbody><tr><td>a</td><td>1</td></tr><tr><td>b</td><td>2</td></tr></tbody></table></body>"
    )
    r = scrape_page(html, "http://site.com/", include_tables=True)
    tables = r["media"]["tables"]
    assert len(tables) == 1
    assert tables[0]["headers"] == ["sku", "price"]
    # excluded_tags=['table'] suppresses table extraction (reference gate)
    r2 = scrape_page(html, "http://site.com/", include_tables=True, excluded_tags=["table"])
    assert "tables" not in r2["media"] or r2["media"]["tables"] == []
    # default off
    r3 = scrape_page(html, "http://site.com/")
    assert "tables" not in r3["media"]


def test_table_snapshot_equals_reparse_on_drop_tags():
    """The single-parse table snapshot must match extract_tables (which
    re-parses with parse-time dropping) — including the misnested case
    where an unclosed drop tag swallows the rest of the document."""
    from crawl4ai_spark.extraction.tables import extract_tables

    well_formed = (
        "<body><p>intro words for context here</p>"
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>x<script>junk()</script></td><td>1</td></tr>"
        "<tr><td>y</td><td>2</td></tr></table>"
        "<iframe src='/ad'></iframe></body>"
    )
    # unclosed iframe inside a cell: parse-time dropping swallows the rest
    misnested = (
        "<body><table><tr><th>a</th><th>b</th></tr>"
        "<tr><td><iframe>x</td><td>1</td></tr>"
        "<tr><td>2</td><td>3</td></tr></table></body>"
    )
    for html in (well_formed, misnested):
        got = scrape_page(html, "http://site.com/", include_tables=True)["media"]["tables"]
        want = [t for t in extract_tables(html) if t.get("is_data_table")]
        assert got == want, html


def test_drop_tags_balance_guard_comments_and_order():
    """The single-parse guard must not be swayed by tokens inside
    comments, and must be order-aware (a stray close before an unclosed
    open is NOT balance) — both cases fall back to the re-parse path and
    must still match extract_tables exactly."""
    from crawl4ai_spark.extraction.markdown import DROP_TAGS
    from crawl4ai_spark.extraction.scrape import _drop_tags_balanced
    from crawl4ai_spark.extraction.tables import extract_tables

    # close inside a comment + real unclosed open: counts would balance
    commented = (
        "<body><!-- </iframe> --><iframe>"
        "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>"
    )
    assert _drop_tags_balanced(commented, DROP_TAGS) is False
    # stray close BEFORE an unclosed open: same total counts, not balanced
    reordered = (
        "<body></iframe><p>x</p><iframe>"
        "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>"
    )
    assert _drop_tags_balanced(reordered, DROP_TAGS) is False
    # a fully-commented drop tag is fine (both parsers ignore comments)
    ok = (
        "<body><!-- <iframe></iframe> -->"
        "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table></body>"
    )
    assert _drop_tags_balanced(ok, DROP_TAGS) is True
    for html in (commented, reordered, ok):
        got = scrape_page(html, "http://site.com/", include_tables=True)["media"]["tables"]
        want = [t for t in extract_tables(html) if t.get("is_data_table")]
        assert got == want, html
