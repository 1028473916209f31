"""Byte-parity of the engine's markdown stage vs the reference pipeline.

The reference's markdown generator (vendored html2text +
DefaultMarkdownGenerator glue) is loaded from the read-only reference
tree as a test-time oracle (tests/h2t_reference.py) and compared
byte-for-byte against ``crawl4ai_spark.extraction`` on:

1. an adversarial fixture battery covering every construct the converter
   implements (headings, emphasis spacing quirks, links/autolinks/mailto,
   images, nested+ordered lists, fenced pre, blockquotes, tables with
   soft-break trailing spaces, dl, entities/charrefs, misnesting);
2. seeded random nested-HTML fuzz;
3. the entire synthetic corpus (whose golden ``text`` column is produced
   by our converter — this test proves that column equals the reference's
   extracted text, the north-rule invariant).

All three reference outputs are compared: raw_markdown,
markdown_with_citations, references_markdown.
"""

import random

import pytest

from crawl4ai_spark.extraction.markdown import generate_markdown_result
from crawl4ai_spark.synth.pages import generate_site
from h2t_reference import reference_markdown

FIXTURES = [
    ("<h1>Title</h1><p>Hello world.</p><h2>Sub</h2><p>More text here.</p>", ""),
    ("<p>a <strong>bold</strong> and <em>ital</em> and <code>x=1</code> end</p>", ""),
    ('<p>see <a href="http://e.com/a">docs</a> and <img src="/i.png" alt="pic"> done</p>', ""),
    ("<ul><li>one</li><li>two<ul><li>deep</li></ul></li></ul><ol><li>first</li><li>second</li></ol>", ""),
    ('<pre data-language="py"><code>def f():\n    return 1\n</code></pre>', ""),
    ("<blockquote><p>quoted line</p><p>second</p></blockquote>", ""),
    ("<table><thead><tr><th>A</th><th>B</th></tr></thead><tbody><tr><td>1</td><td>2</td></tr></tbody></table>", ""),
    ("<p>one<br>two</p><hr><p>after</p>", ""),
    ("<p>a &amp; b &lt;c&gt; &nbsp; d &mdash; e &#x2014; f &unknown; g</p>", ""),
    ("<div><div><p>x</p></div><span>tail inline</span></div>", ""),
    ("<html><head><title>T</title><style>p{}</style><script>x</script></head><body><p>body text</p></body></html>", ""),
    ("<p>b<strong>tight</strong>c and <em> sp </em>. dot</p>", ""),
    ('<p><a href="/x" title="t[t]">txt</a> <a href="">empty</a> <a>nohref</a></p>', "http://b.com/d/"),
    ('<p><a href="http://x.com/">http://x.com/</a> and <a href="/r">http://x.com/</a></p>', ""),
    ('<h2><a href="/x">linked heading</a></h2>', ""),
    ('<p><a href="/t"><img src="i.png" alt="a"></a></p>', "http://b.com/"),
    ('<p><a href="/c"><code>fn()</code></a></p>', ""),
    ('<p><a href="mailto:a@b.c">mail me</a></p>', ""),
    ('<ol start="3"><li>three</li><li>four</li></ol>', ""),
    ("<ol><li>a<ul><li>b</li></ul></li><li>c</li></ol>", ""),
    ("<dl><dt>term</dt><dd>def</dd><dt>t2</dt><dd>d2</dd></dl>", ""),
    ("<p>x<sub>1</sub> y<sup>2</sup> <u>und</u> <small>sm</small></p>", ""),
    ("<p></p><p>next</p><div></div>", ""),
    ("<p>a\n   b\t\tc</p>", ""),
    ("<blockquote><ul><li>q1</li><li>q2</li></ul></blockquote><p>after</p>", ""),
    ("<blockquote>a<blockquote>b</blockquote>c</blockquote>", ""),
    ('<table><tr><th>A</th></tr><tr><td>1</td><td>2</td></tr><tr><td>only</td></tr></table>', ""),
    ('<table><caption>Cap</caption><tr><td>x</td></tr></table>', ""),
    ("<p>a<del>gone</del>b ~<s>x</s></p>", ""),
    ("<p>he said <q>hi</q> there</p>", ""),
    ('<p><abbr title="Hyper">HTML</abbr> rocks</p>', ""),
    ("<p>press <kbd>Ctrl</kbd> now</p>", ""),
    ('<html><head><base href="http://base.org/sub/"></head><body><a href="x">l</a></body></html>', ""),
    ("<pre>no code tag\nline2</pre><p>after</p>", ""),
    ("<p>a <b>b <i>c</b> d</i> e</p>", ""),
    ("<span>lead</span><p>para</p>trail", ""),
    ('<p><img alt="x"> <img src="s.png"></p>', ""),
    ("<p>&#65;&#x42; &#8212;</p>", ""),
]


def _assert_parity(html: str, base_url: str) -> None:
    mine = generate_markdown_result(html, base_url)
    ref_raw, ref_cited, ref_refs = reference_markdown(html, base_url)
    assert mine["raw_markdown"] == ref_raw
    assert mine["markdown_with_citations"] == ref_cited
    assert mine["references_markdown"] == ref_refs


@pytest.mark.parametrize("html,base_url", FIXTURES)
def test_fixture_parity(html, base_url):
    _assert_parity(html, base_url)


def test_fuzz_parity():
    rng = random.Random(20260817)
    tags = [
        "p", "div", "span", "em", "strong", "b", "i", "u", "code", "a",
        "ul", "ol", "li", "h1", "h2", "h3", "blockquote", "table", "tr",
        "td", "th", "pre", "br", "hr", "img", "small", "sub", "sup",
        "dl", "dt", "dd", "del", "q", "kbd", "section", "article",
    ]
    words = [
        "alpha", "beta code", "x*y", "_under_", "a.b", "hi!", "(par)",
        "[br]", "tail  sp", "&", "mid\ndata", "*", "~x", "plain",
    ]

    def gen(depth: int) -> str:
        parts = []
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.45 or depth > 4:
                parts.append(rng.choice(words))
                continue
            t = rng.choice(tags)
            if t in ("br", "hr"):
                parts.append(f"<{t}>")
            elif t == "img":
                parts.append(f'<img src="/i{rng.randint(0, 3)}.png" alt="{rng.choice(["", "pic", "a b"])}">')
            elif t == "a":
                href = rng.choice(["/r", "http://x.com/", "", "#f", "mailto:a@b.c"])
                parts.append(f'<a href="{href}">{gen(depth + 1)}</a>')
            else:
                parts.append(f"<{t}>{gen(depth + 1)}</{t}>")
        return "".join(parts)

    for _ in range(200):
        _assert_parity(gen(0), "http://fuzz.test/dir/")


def test_corpus_parity():
    """The golden text column == reference-extracted text, per URL."""
    site = generate_site()
    assert len(site["pages"]) > 100
    for page in site["pages"]:
        html = page["html"].decode("utf-8")
        ref_raw, _, _ = reference_markdown(html, page["url"])
        assert page["text"] == ref_raw, f"text != reference for {page['url']}"
        _assert_parity(html, page["url"])


WIKI_FIXTURE = "/root/reference/tests/async/sample_wikipedia.html"


def test_reference_wikipedia_fixture_parity():
    """The reference's own 768 KB real-Wikipedia test fixture
    (tests/async/sample_wikipedia.html, used by its content-extraction
    suite) through both converters — byte-equal on all three outputs."""
    import os

    if not os.path.exists(WIKI_FIXTURE):
        pytest.skip("reference fixture not present")
    with open(WIKI_FIXTURE, encoding="utf-8", errors="replace") as fh:
        html = fh.read()
    base = "https://en.wikipedia.org/wiki/Test"
    ours = generate_markdown_result(html, base)
    raw, cited, refs = reference_markdown(html, base_url=base)
    assert ours["raw_markdown"] == raw
    assert ours["markdown_with_citations"] == cited
    assert ours["references_markdown"] == refs
    assert len(raw) > 10_000  # sanity: the page actually converted


def test_reference_wikipedia_fixture_scrape_battery():
    """Same real page through the scrape battery: structural sanity on a
    document none of our fixtures synthesized."""
    import os

    if not os.path.exists(WIKI_FIXTURE):
        pytest.skip("reference fixture not present")
    from crawl4ai_spark.extraction.scrape import scrape_page

    with open(WIKI_FIXTURE, encoding="utf-8", errors="replace") as fh:
        html = fh.read()
    r = scrape_page(html, "https://en.wikipedia.org/wiki/Test",
                    score_links=True, include_tables=True)
    assert r["success"]
    assert len(r["links"]["internal"]) > 50
    assert all(
        l["intrinsic_score"] is not None for l in r["links"]["internal"][:10]
    )
    assert r["cleaned_html"] and "<script" not in r["cleaned_html"].lower()
