"""Spark wave loop ≡ single-process reference crawler, plus resume and
checkpoint invariants."""

import os

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.frontier.bfs import CrawlConfig, run_crawl
from crawl4ai_spark.frontier.store import WaveStore

from tests.reference_crawler import reference_crawl


def _inputs(spark, site_dir):
    pages = spark.read.parquet(os.path.join(site_dir, "pages.parquet"))
    seeds = spark.read.parquet(os.path.join(site_dir, "seeds.parquet"))
    robots = spark.read.parquet(os.path.join(site_dir, "robots.parquet"))
    budgets = spark.read.parquet(os.path.join(site_dir, "host_budgets.parquet"))
    return pages, seeds, robots, budgets


def _reference(site, budgets=None, robots=True, **kw):
    pages_by_url = {p["url"]: p["html"] for p in site["pages"]}
    seeds = [s["url"] for s in site["seeds"]]
    robots_rules = {r["host"]: r["rules_text"] for r in site["robots"]} if robots else None
    return reference_crawl(pages_by_url, seeds, budgets=budgets, robots_rules=robots_rules, **kw)


def _spark_waves(spark, store_dir):
    store = WaveStore(spark, store_dir)
    results = store.read_table("results")
    out = []
    for wave in store.committed_waves():
        rows = results.where(F.col("wave") == wave).select("url", "status").collect()
        out.append(
            {
                "attempted": {r.url for r in rows},
                "denied": {r.url for r in rows if r.status == "robots_denied"},
                "fetched": {r.url for r in rows if r.status == "fetched"},
            }
        )
    return [w for w in out if w["attempted"]]


@pytest.mark.parametrize("use_bloom", [True, False])
def test_bfs_matches_reference_with_budgets_and_robots(
    spark, site, site_dir, tmp_path, use_bloom
):
    pages, seeds, robots, budgets = _inputs(spark, site_dir)
    store_dir = str(tmp_path / f"store_bloom_{use_bloom}")
    config = CrawlConfig(max_depth=3, links_only=True, use_bloom=use_bloom, n_bloom_shards=4)
    summary = run_crawl(spark, pages, seeds, store_dir, config, robots=robots, host_budgets=budgets)

    budget_map = {r["host"]: r["budget"] for r in site["host_budgets"]}
    ref = _reference(site, budgets=budget_map, max_depth=3)

    got_waves = _spark_waves(spark, store_dir)
    assert len(got_waves) == len(ref["waves"]), (
        f"wave count mismatch: spark={len(got_waves)} ref={len(ref['waves'])}"
    )
    for i, (got, want) in enumerate(zip(got_waves, ref["waves"])):
        assert got["attempted"] == want["attempted"], f"wave {i} attempted set differs"
        assert got["denied"] == want["denied"], f"wave {i} denied set differs"
        assert got["fetched"] == want["fetched"], f"wave {i} fetched set differs"
    assert summary["total_attempted"] == len(ref["attempted"])


def test_bfs_depths_match_link_graph_oracle(spark, site, site_dir, tmp_path):
    """Unlimited budget, no robots → pure BFS; depths must equal the
    generator's link-graph oracle."""
    pages, seeds, _, _ = _inputs(spark, site_dir)
    store_dir = str(tmp_path / "store_pure")
    config = CrawlConfig(max_depth=3, links_only=True, use_bloom=False)
    run_crawl(spark, pages, seeds, store_dir, config)

    store = WaveStore(spark, store_dir)
    got = {
        r.url: r.depth
        for r in store.read_table("results").select("url", "depth").collect()
    }
    want = {r["url"]: r["depth"] for r in site["link_graph"]}
    assert got == want


def test_no_url_attempted_twice(spark, site_dir, tmp_path):
    pages, seeds, robots, budgets = _inputs(spark, site_dir)
    store_dir = str(tmp_path / "store_once")
    run_crawl(
        spark, pages, seeds, store_dir,
        CrawlConfig(max_depth=3, links_only=True, n_bloom_shards=4),
        robots=robots, host_budgets=budgets,
    )
    store = WaveStore(spark, store_dir)
    results = store.read_table("results")
    dups = results.groupBy("url").count().where(F.col("count") > 1).count()
    assert dups == 0


def test_resume_exactly_continues(spark, site, site_dir, tmp_path):
    """Kill after 2 waves (max_waves), rerun → identical final state to an
    uninterrupted crawl, no duplicate attempts."""
    pages, seeds, robots, budgets = _inputs(spark, site_dir)
    store_dir = str(tmp_path / "store_resume")
    config_partial = CrawlConfig(max_depth=3, links_only=True, max_waves=2, n_bloom_shards=4)
    run_crawl(spark, pages, seeds, store_dir, config_partial, robots=robots, host_budgets=budgets)
    store = WaveStore(spark, store_dir)
    assert store.last_wave() == 1  # stopped early

    config_full = CrawlConfig(max_depth=3, links_only=True, n_bloom_shards=4)
    summary = run_crawl(spark, pages, seeds, store_dir, config_full, robots=robots, host_budgets=budgets)
    assert summary["resumed_from"] == 1

    budget_map = {r["host"]: r["budget"] for r in site["host_budgets"]}
    ref = _reference(site, budgets=budget_map, max_depth=3)
    results = store.read_table("results")
    assert {r.url for r in results.select("url").collect()} == ref["attempted"]
    dups = results.groupBy("url").count().where(F.col("count") > 1).count()
    assert dups == 0
    # per-wave sets still match the reference across the kill/resume boundary
    got_waves = _spark_waves(spark, store_dir)
    for i, (got, want) in enumerate(zip(got_waves, ref["waves"])):
        assert got["attempted"] == want["attempted"], f"wave {i} differs across resume"


def test_max_pages_budget(spark, site, site_dir, tmp_path):
    pages, seeds, _, _ = _inputs(spark, site_dir)
    store_dir = str(tmp_path / "store_cap")
    config = CrawlConfig(max_depth=3, links_only=True, max_pages=10, use_bloom=False)
    summary = run_crawl(spark, pages, seeds, store_dir, config)
    assert summary["total_attempted"] <= 10
    ref = _reference(site, robots=False, max_pages=10, max_depth=3)
    store = WaveStore(spark, store_dir)
    got = {r.url for r in store.read_table("results").select("url").collect()}
    assert got == ref["attempted"]


def test_full_extraction_mode_writes_markdown(spark, site, site_dir, tmp_path):
    pages, seeds, _, _ = _inputs(spark, site_dir)
    store_dir = str(tmp_path / "store_full")
    config = CrawlConfig(max_depth=1, links_only=False, use_bloom=False)
    run_crawl(spark, pages, seeds, store_dir, config)
    store = WaveStore(spark, store_dir)
    results = store.read_table("results").where(F.col("status") == "fetched")
    golden = {p["url"]: p["text"] for p in site["pages"]}
    for row in results.select("url", "raw_markdown", "title", "lang").collect():
        assert row.raw_markdown == golden[row.url], f"markdown mismatch for {row.url}"
        assert row.title
        assert row.lang


def test_dfs_strategy_matches_reference_preorder(spark, tmp_path):
    """DFS mode with wave size 1 must reproduce an explicit-stack DFS
    (children pushed reversed → first link popped next) exactly, in
    sequence, on a single-host site."""
    from urllib.parse import urlparse

    from crawl4ai_spark.frontier.bfs import CrawlConfig
    from crawl4ai_spark.synth.pages import generate_site, write_site_parquet
    from crawl4ai_spark.extraction.links import extract_links

    site = generate_site(n_hosts=1, cats=2, subs=2, prods=2)
    d = tmp_path / "site_dfs"
    write_site_parquet(site, str(d))
    pages_by_url = {p["url"]: p["html"] for p in site["pages"]}
    seed = site["seeds"][0]["url"]

    # reference: explicit stack, seen-at-push, children pushed reversed
    def python_dfs(max_depth=3):
        order = []
        stack = [(seed, 0)]
        seen = {seed}
        while stack:
            url, depth = stack.pop()
            order.append(url)
            if depth >= max_depth:
                continue
            html = pages_by_url.get(url)
            if html is None:
                continue
            links = extract_links(html.decode(), url)
            hrefs = [l["href"] for l in links["internal"] + links["external"]]
            hrefs = [h for h in hrefs
                     if urlparse(h).scheme in ("http", "https") and "." in urlparse(h).netloc]
            fresh = [h for h in hrefs if h not in seen]
            for h in fresh:
                seen.add(h)
            for h in reversed(fresh):
                stack.append((h, depth + 1))
        return order

    pages = spark.read.parquet(str(d / "pages.parquet"))
    seeds = spark.read.parquet(str(d / "seeds.parquet"))
    store_dir = str(tmp_path / "store_dfs")
    from crawl4ai_spark.frontier.bfs import run_crawl
    from crawl4ai_spark.frontier.store import WaveStore

    config = CrawlConfig(
        max_depth=3, links_only=True, use_bloom=False,
        strategy="dfs", default_budget=1, max_waves=200,
    )
    run_crawl(spark, pages, seeds, store_dir, config)
    results = WaveStore(spark, store_dir).read_table("results")
    got = [r.url for r in results.orderBy("wave").collect()]
    want = python_dfs()
    assert got == want, f"\nspark: {got[:8]}...\nref:   {want[:8]}..."


def test_throttled_host_backoff_and_retirement(spark, tmp_path):
    """Pages with status_code 429 drive the RateLimiter state machine end
    to end: the throttled host is recorded (not attempted), backed off
    with doubling cooldowns, retried after each cooldown, and finally
    retired after max_retries — while a healthy host crawls normally and
    the loop terminates."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.frontier.bfs import CrawlConfig, run_crawl
    from crawl4ai_spark.frontier.store import WaveStore

    def page(host, path, links=()):
        body = "".join(f'<a href="http://{host}{l}">l</a>' for l in links)
        return f"<html><body><h1>{path}</h1>{body}</body></html>".encode()

    rows = [
        ("http://ok.com/", page("ok.com", "/", ["/a", "/b"]), 200),
        ("http://ok.com/a", page("ok.com", "/a"), 200),
        ("http://ok.com/b", page("ok.com", "/b"), 200),
        ("http://slow.com/", page("slow.com", "/"), 429),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary, status_code int")
    seeds = spark.createDataFrame(
        [("http://ok.com/",), ("http://slow.com/",)], "url string"
    )
    store_dir = str(tmp_path / "store")
    summary = run_crawl(
        spark, pages, seeds, store_dir,
        CrawlConfig(max_depth=2, links_only=True, use_bloom=False, max_waves=30),
    )
    store = WaveStore(spark, store_dir)
    results = store.read_table("results").collect()
    by_url = {}
    for r in results:
        by_url.setdefault(r.url, []).append(r.status)
    # healthy host fully crawled
    assert "fetched" in by_url["http://ok.com/"]
    assert "fetched" in by_url["http://ok.com/a"]
    # throttled host: recorded as throttled (with cooldown-spaced retries,
    # so more than one attempt), never fetched
    assert set(by_url["http://slow.com/"]) == {"throttled"}
    assert len(by_url["http://slow.com/"]) > 1
    # throttled attempts don't count toward total_attempted
    assert summary["total_attempted"] == 3
    # the host ends retired (cooldown sentinel -1) after max_retries
    hs = {r.host: r for r in store.read_latest("host_state").collect()}
    assert hs["slow.com"].cooldown_waves == -1
    assert hs["slow.com"].fail_count > 3
    # backoff doubled the delay from base 0.25 (capped at 60)
    assert hs["slow.com"].current_delay > 0.25
    # metrics recorded throttles
    n_throttled = sum(r.n_throttled for r in store.read_table("metrics").collect())
    assert n_throttled == len(by_url["http://slow.com/"])


def test_scrape_mode_emits_crawlresult_surface(spark, site, site_dir, tmp_path):
    """content_mode="scrape" wires the scraping battery into the wave
    loop: fetched rows must carry cleaned_html, media (incl. tables when
    configured), rich scored links, and scrape_success — the CrawlResult
    surface of the reference's default flow (async_webcrawler.py:783,
    825-877)."""
    pages, seeds, _, _ = _inputs(spark, site_dir)
    store_dir = str(tmp_path / "store_scrape")
    config = CrawlConfig(
        max_depth=1,
        content_mode="scrape",
        use_bloom=False,
        scrape_options={"include_tables": True},
        fit_markdown=True,
    )
    run_crawl(spark, pages, seeds, store_dir, config)
    store = WaveStore(spark, store_dir)
    results = store.read_table("results").where(F.col("status") == "fetched")
    rows = results.select(
        "url", "cleaned_html", "media", "links", "scrape_success",
        "raw_markdown", "title", "fit_markdown",
    ).collect()
    assert rows
    golden = {p["url"]: p["text"] for p in site["pages"]}
    for row in rows:
        assert row.scrape_success
        assert row.cleaned_html and "<script" not in row.cleaned_html
        assert row.title
        assert row.fit_markdown is not None
        # rich link structs carry the scoring fields
        for link in (row.links.internal or []) + (row.links.external or []):
            assert link.intrinsic_score is not None
            assert link.total_score is not None
        assert row.media is not None
    # markdown in scrape mode comes from cleaned_html; on the synthetic
    # site (no boilerplate outside body) it still matches the golden text
    for row in rows:
        assert row.raw_markdown == golden[row.url], f"markdown mismatch for {row.url}"


def test_scrape_mode_score_from_links_best_first(spark, tmp_path):
    """score_from_links: discovered URLs inherit the scrape battery's
    total_score as frontier priority — a /docs/ link (intrinsic-boosted)
    must be selected before a /cart/ link under a budget of 1."""
    root = "http://s.test/"
    html_root = (
        '<html><body>'
        '<a href="http://s.test/docs/guide">deep dive guide here</a>'
        '<a href="http://s.test/cart/x">click here</a>'
        "</body></html>"
    )
    pages = spark.createDataFrame(
        [(root, html_root.encode()), ("http://s.test/docs/guide", b"<html><body>g</body></html>"),
         ("http://s.test/cart/x", b"<html><body>c</body></html>")],
        "url string, html binary",
    )
    seeds = spark.createDataFrame([(root,)], "url string")
    store_dir = str(tmp_path / "store_bff_links")
    config = CrawlConfig(
        max_depth=1, content_mode="scrape", score_from_links=True,
        default_budget=1, use_bloom=False,
    )
    run_crawl(spark, pages, seeds, store_dir, config)
    store = WaveStore(spark, store_dir)
    results = store.read_table("results")
    by_wave = {
        r.url: r.wave for r in results.select("url", "wave").collect()
    }
    assert by_wave["http://s.test/docs/guide"] < by_wave["http://s.test/cart/x"]


def test_fit_markdown_drops_boilerplate_not_raw(spark, tmp_path):
    """fit_markdown (PruningContentFilter) must drop nav/footer
    boilerplate while raw_markdown keeps it (reference attaches
    fit_markdown to every CrawlResult when a filter is configured)."""
    body = (
        "<html><body>"
        '<nav class="menu"><a href="/a">x</a><a href="/b">y</a><a href="/c">z</a></nav>'
        "<article><p>"
        + "This is the long central article text that carries the page. " * 8
        + "</p></article>"
        '<footer class="footer"><a href="/p">p</a><a href="/q">q</a></footer>'
        "</body></html>"
    )
    pages = spark.createDataFrame(
        [("http://f.test/a", body.encode())], "url string, html binary"
    )
    seeds = spark.createDataFrame([("http://f.test/a",)], "url string")
    store_dir = str(tmp_path / "store_fit")
    config = CrawlConfig(max_depth=0, content_mode="scrape", fit_markdown=True, use_bloom=False)
    run_crawl(spark, pages, seeds, store_dir, config)
    store = WaveStore(spark, store_dir)
    row = store.read_table("results").select("raw_markdown", "fit_markdown").head()
    assert "central article text" in row.raw_markdown
    assert "central article text" in row.fit_markdown
    assert row.fit_markdown != row.raw_markdown


def test_scrape_options_score_links_and_reserved_keys(spark, tmp_path):
    """scrape_options={"score_links": False} is a legitimate scrape_page
    option and must not collide with the loop's own kwargs (it used to
    raise TypeError: multiple values for 'score_links'); reserved keys
    get a clear error instead of a worker-side crash."""
    import pytest

    html = '<html><body><a href="http://s.test/docs/a">deep guide</a></body></html>'
    pages = spark.createDataFrame(
        [("http://s.test/", html.encode())], "url string, html binary"
    )
    seeds = spark.createDataFrame([("http://s.test/",)], "url string")
    config = CrawlConfig(
        max_depth=0, content_mode="scrape", use_bloom=False,
        scrape_options={"score_links": False},
    )
    run_crawl(spark, pages, seeds, str(tmp_path / "store_nosl"), config)
    store = WaveStore(spark, str(tmp_path / "store_nosl"))
    row = store.read_table("results").where(F.col("status") == "fetched").head()
    link = row.links.internal[0]
    # scoring off: intrinsic unset, total falls back to the neutral 5.0
    # (reference calculate_total_score without score_links)
    assert link.intrinsic_score is None
    assert link.total_score == 5.0

    # misplaced CrawlConfig fields in scrape_options: clear driver-side error
    bad = CrawlConfig(
        max_depth=0, content_mode="scrape", use_bloom=False,
        scrape_options={"query": "x"},
    )
    with pytest.raises(ValueError, match="CrawlConfig.query"):
        run_crawl(spark, pages, seeds, str(tmp_path / "store_bad"), bad)


def test_fit_markdown_in_links_mode(spark, tmp_path):
    """CrawlConfig(fit_markdown=True) must be honored in the default
    'links' content mode too (it used to be silently NULL)."""
    body = (
        "<html><body>"
        '<nav class="menu"><a href="/a">x</a><a href="/b">y</a><a href="/c">z</a></nav>'
        "<article><p>"
        + "This is the long central article text that carries the page. " * 8
        + "</p></article>"
        "</body></html>"
    )
    pages = spark.createDataFrame(
        [("http://f.test/a", body.encode())], "url string, html binary"
    )
    seeds = spark.createDataFrame([("http://f.test/a",)], "url string")
    store_dir = str(tmp_path / "store_fit_links")
    config = CrawlConfig(max_depth=0, content_mode="links", fit_markdown=True, use_bloom=False)
    run_crawl(spark, pages, seeds, store_dir, config)
    store = WaveStore(spark, store_dir)
    row = store.read_table("results").select("fit_markdown").head()
    assert row.fit_markdown is not None
    assert "central article text" in row.fit_markdown


def test_score_from_links_requires_scrape_mode(spark, tmp_path):
    """score_from_links outside content_mode='scrape' must fail loudly,
    not silently degrade best-first to constant-score order."""
    import pytest

    pages = spark.createDataFrame(
        [("http://s.test/", b"<html><body>x</body></html>")], "url string, html binary"
    )
    seeds = spark.createDataFrame([("http://s.test/",)], "url string")
    bad = CrawlConfig(max_depth=0, score_from_links=True, use_bloom=False)
    with pytest.raises(ValueError, match="score_from_links"):
        run_crawl(spark, pages, seeds, str(tmp_path / "s"), bad)


def test_host_prior_steers_budgeted_selection_and_preserves_seen_set(
    spark, site, site_dir, tmp_path
):
    """CrawlConfig.host_prior: under a max_pages budget the boosted
    host's candidates win the (score desc, …) rank; without a budget
    the prior is pure reordering — the final URL-seen set is unchanged."""
    pages, seeds, _, _ = _inputs(spark, site_dir)

    # unbounded baseline: the full reachable set
    base_dir = str(tmp_path / "store_nop")
    run_crawl(
        spark, pages, seeds, base_dir,
        CrawlConfig(max_depth=3, links_only=True, use_bloom=False),
    )
    base = WaveStore(spark, base_dir).read_table("results")
    full_set = {r.url for r in base.select("url").collect()}
    hosts = sorted({u.split("/")[2] for u in full_set})
    assert len(hosts) >= 2
    boosted_host = hosts[-1]  # losing host under plain url-asc tie-break
    prior = spark.createDataFrame([(boosted_host, 1.0)], "host string, prior double")

    n_seeds = seeds.count()
    cap = n_seeds + 2  # below the 3 depth-1 candidates each host offers
    capped_cfg = dict(max_depth=3, links_only=True, use_bloom=False, max_pages=cap)

    plain_dir = str(tmp_path / "store_plain_cap")
    run_crawl(spark, pages, seeds, plain_dir, CrawlConfig(**capped_cfg))
    plain = {
        r.url
        for r in WaveStore(spark, plain_dir).read_table("results").select("url").collect()
    }

    boost_dir = str(tmp_path / "store_boost_cap")
    run_crawl(
        spark, pages, seeds, boost_dir,
        CrawlConfig(**capped_cfg, host_prior=prior, host_prior_weight=10.0),
    )
    boosted = {
        r.url
        for r in WaveStore(spark, boost_dir).read_table("results").select("url").collect()
    }

    def on_host(urls):
        return {u for u in urls if u.split("/")[2] == boosted_host}

    seed_urls = {r.url for r in seeds.select("url").collect()}
    # every budgeted non-seed slot goes to the boosted host, and strictly
    # more of the boosted host is attempted than in the unboosted run
    assert on_host(boosted - seed_urls) == boosted - seed_urls
    assert len(on_host(boosted)) > len(on_host(plain))

    # no budget → same seen set with and without the prior
    inv_dir = str(tmp_path / "store_boost_nocap")
    run_crawl(
        spark, pages, seeds, inv_dir,
        CrawlConfig(
            max_depth=3, links_only=True, use_bloom=False,
            host_prior=prior, host_prior_weight=10.0,
        ),
    )
    inv = {
        r.url
        for r in WaveStore(spark, inv_dir).read_table("results").select("url").collect()
    }
    assert inv == full_set


def test_host_authority_prior_rollup(spark):
    from crawl4ai_spark.operators.graph import host_authority_prior

    edges = [
        ("http://big.test/a", "http://big.test/b"),
        ("http://big.test/b", "http://big.test/a"),
        ("http://small.test/x", "http://big.test/a"),
        ("http://small.test/x", "http://small.test/y"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    for kind in ("pagerank", "hits"):
        out = {r["host"]: r["prior"] for r in host_authority_prior(df, kind=kind).collect()}
        assert set(out) == {"big.test", "small.test"}
        # min-max scaled: the dominant host pins 1.0, the other 0.0
        assert out["big.test"] == 1.0 and out["small.test"] == 0.0
    with pytest.raises(ValueError):
        host_authority_prior(df, kind="degree")
