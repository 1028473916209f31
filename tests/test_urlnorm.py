"""URL canonicalization parity cases.

Case inventory modeled on the reference's ``tests/test_normalize_url.py``
(relative paths, trailing slash, fragments, query handling, invalid
schemes) and the frontier-dedup quirks of
``crawl4ai/utils.py:2317-2373``.
"""

from crawl4ai_spark.functions.urlnorm import (
    canonicalize_for_frontier,
    canonicalize_full,
    get_base_domain,
    is_external_url,
    is_valid_crawl_url,
    should_skip_href,
)

BASE = "http://site0.com/cat0/sub1/"


def test_relative_resolution():
    assert canonicalize_for_frontier("prod2.html", BASE) == "http://site0.com/cat0/sub1/prod2.html"
    assert canonicalize_for_frontier("../sub0/", BASE) == "http://site0.com/cat0/sub0/"
    assert canonicalize_for_frontier("/", BASE) == "http://site0.com/"


def test_fragment_dropped_always():
    assert canonicalize_for_frontier("/page#sec", BASE) == "http://site0.com/page"
    assert canonicalize_for_frontier("http://x.com/#top", BASE) == "http://x.com/"


def test_empty_path_becomes_root():
    assert canonicalize_for_frontier("http://x.com", BASE) == "http://x.com/"


def test_trailing_slash_significant():
    a = canonicalize_for_frontier("http://x.com/a/", BASE)
    b = canonicalize_for_frontier("http://x.com/a", BASE)
    assert a != b


def test_netloc_lowercased():
    assert canonicalize_for_frontier("HTTP://WWW.X.COM/A", BASE) == "http://www.x.com/A"


def test_tracking_params_dropped_frontier():
    out = canonicalize_for_frontier("/p?utm_source=x&id=3&fbclid=z&ref=tw", BASE)
    assert out == "http://site0.com/p?id=3"


def test_frontier_query_grouping_quirk():
    # duplicate keys group under first occurrence (parse_qs semantics)
    out = canonicalize_for_frontier("/p?b=2&a=1&b=3", BASE)
    assert out == "http://site0.com/p?b=2&b=3&a=1"
    # blank values are dropped by the frontier variant
    out2 = canonicalize_for_frontier("/p?a=&b=1", BASE)
    assert out2 == "http://site0.com/p?b=1"


def test_full_variant_sorts_and_keeps_blanks():
    out = canonicalize_full("/p?b=2&a=1&utm_term=q&c=", BASE)
    assert out == "http://site0.com/p?a=1&b=2&c="


def test_none_and_empty():
    assert canonicalize_for_frontier(None, BASE) is None
    assert canonicalize_for_frontier("", BASE) is None


def test_base_domain():
    assert get_base_domain("http://www.example.com/x") == "example.com"
    assert get_base_domain("https://shop.example.co.uk:8080/") == "example.co.uk"
    assert get_base_domain("http://sub.deep.site0.com/") == "site0.com"
    assert get_base_domain("not a url") == ""


def test_is_external():
    assert not is_external_url("http://blog.site0.com/x", "site0.com")
    assert is_external_url("http://site1.com/", "site0.com")
    assert is_external_url("mailto:a@b.com", "site0.com")
    assert not is_external_url("/relative", "site0.com")


def test_validity_gate():
    assert is_valid_crawl_url("http://a.com/x")
    assert not is_valid_crawl_url("ftp://a.com/x")
    assert not is_valid_crawl_url("http://localhost/x")  # no dot
    assert not is_valid_crawl_url(None)


def test_skip_prefixes():
    for href in ("#top", "javascript:void(0)", "mailto:x@y.z", "tel:123", ""):
        assert should_skip_href(href)
    assert not should_skip_href("/ok")


def test_fast_path_equals_slow_path():
    """The already-canonical fast path must return exactly what the full
    urllib pipeline would, across adversarial and fuzzed hrefs."""
    import random

    from crawl4ai_spark.functions import urlnorm
    from crawl4ai_spark.functions.urlnorm import canonicalize_for_frontier

    def slow(href, base):
        # disable the fast path to get the reference answer
        orig = urlnorm._CANONICAL_ALREADY_RE
        class _Never:
            @staticmethod
            def match(_s):
                return None
        urlnorm._CANONICAL_ALREADY_RE = _Never()
        try:
            return canonicalize_for_frontier(href, base)
        finally:
            urlnorm._CANONICAL_ALREADY_RE = orig

    base = "http://site0.com/dir/"
    cases = [
        "http://h5.bench.test/p123",
        "http://h5.bench.test/",
        "https://a.com/x/y/z.html",
        "http://a.com:8080/p",
        "HTTP://A.com/p",            # uppercase -> slow path must run
        "http://A.com/p",
        "http://a.com/p?b=2&a=1",
        "http://a.com/p#frag",
        "http://a.com/p;params",
        "http://a.com/./x",
        "http://a.com/../x",
        "http://a.com/x/..",
        "http://a.com",               # no path
        "http://a.com/p q",           # space
        "http://a.com/p\tq",          # tab (urlsplit strips it)
        "http://user@a.com/p",
        "http://a_b.com/p",
        "rel/path", "/abs/path", "?q=1", "../up",
        "http://a.com/p%20x",
        "http://[::1]/p",
        "http://a.com\\x",
    ]
    rng = random.Random(99)
    chars = "abcXYZ019/.-_%?#=&;:@ \t"
    for _ in range(3000):
        n = rng.randint(1, 24)
        cases.append("http://" + "".join(rng.choice(chars) for _ in range(n)))
    for href in cases:
        assert canonicalize_for_frontier(href, base) == slow(href, base), href
