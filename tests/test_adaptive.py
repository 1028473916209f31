"""Adaptive digest loop (frontier/adaptive.py) vs the reference's
AdaptiveCrawler semantics (crawl4ai/adaptive_crawler.py:1330-1471,
StatisticalStrategy :301-612)."""

import math

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.frontier.adaptive import (
    AdaptiveConfig,
    adaptive_digest,
    rank_pending_links,
    _clean_tokens,
)
from crawl4ai_spark.operators.bm25 import saturation_stat


def _page(title, paragraphs, links=()):
    body = "".join(
        f'<a href="{href}" title="{t}">{text}</a>' for href, text, t in links
    )
    prose = "".join(f"<p>{p}</p>" for p in paragraphs)
    return f"<html><head><title>{title}</title></head><body><h1>{title}</h1>{prose}{body}</body></html>".encode()


@pytest.fixture(scope="module")
def topic_site(spark):
    """A site with a 'spark streaming' topic cluster and an off-topic
    wing. Seed links to both; anchors tell them apart."""
    S = "http://site.test"
    rows = [
        (
            f"{S}/",
            _page(
                "Home",
                ["welcome portal index page with assorted words"],
                [
                    (f"{S}/streaming", "spark streaming guide watermark", "streaming docs"),
                    (f"{S}/cooking", "banana bread recipe baking", "cooking blog"),
                    (f"{S}/gardening", "tomato seedling compost", "garden notes"),
                ],
            ),
        ),
        (
            f"{S}/streaming",
            _page(
                "Streaming",
                [
                    "spark structured streaming processes unbounded data with watermark semantics",
                    "triggers checkpoint state stores exactly once delivery guarantees",
                ],
                [
                    (f"{S}/streaming/watermarks", "watermark late data streaming", "watermarks"),
                    (f"{S}/streaming/state", "stateful streaming operators spark", "state"),
                ],
            ),
        ),
        (
            f"{S}/streaming/watermarks",
            _page(
                "Watermarks",
                [
                    "watermarks bound lateness for streaming aggregations in spark",
                    "event time windows close when the watermark passes their end",
                ],
            ),
        ),
        (
            f"{S}/streaming/state",
            _page(
                "State",
                [
                    "stateful processing keeps per key state between streaming batches",
                    "spark state stores checkpoint to reliable storage for recovery",
                ],
            ),
        ),
        (
            f"{S}/cooking",
            _page(
                "Cooking",
                ["banana bread needs ripe bananas flour sugar butter and an oven"],
            ),
        ),
        (
            f"{S}/gardening",
            _page(
                "Gardening",
                ["tomato seedlings want compost sunlight and regular watering"],
            ),
        ),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_digest_prefers_on_topic_links(spark, topic_site, tmp_path):
    """With top_k=1 the first expansion must pick the streaming page, not
    the cooking/gardening wings — relevance drives selection order (the
    reference's rank_links)."""
    res = adaptive_digest(
        spark,
        topic_site,
        "http://site.test/",
        "spark streaming watermark",
        str(tmp_path / "st"),
        AdaptiveConfig(top_k_links=1, max_depth=2, confidence_threshold=1.0,
                       saturation_threshold=1.01, min_gain_threshold=0.0),
    )
    assert res.crawl_order[0] == "http://site.test/"
    assert res.crawl_order[1] == "http://site.test/streaming"
    # second expansion stays inside the topic cluster
    assert res.crawl_order[2].startswith("http://site.test/streaming/")
    assert res.pages_crawled == 3 and res.depth_reached == 2


def test_digest_confidence_stop(spark, topic_site, tmp_path):
    """An on-topic seed whose coverage already clears the threshold stops
    on confidence without spending the page budget."""
    res = adaptive_digest(
        spark,
        topic_site,
        "http://site.test/streaming",
        "spark streaming watermark state",
        str(tmp_path / "conf"),
        AdaptiveConfig(top_k_links=2, max_depth=5, max_pages=6,
                       confidence_threshold=0.55, saturation_threshold=1.01,
                       min_gain_threshold=0.0),
    )
    assert res.stop_reason == "confidence"
    assert res.confidence >= 0.55
    assert res.pages_crawled < 6


def test_digest_metrics_match_reference_formulas(spark, topic_site, tmp_path):
    """Per-wave parity of every driver-mirrorable statistic: coverage
    (adaptive_crawler.py:328-367), saturation (:396-411) over the
    recorded new-terms history, and the weighted combine (:309-326).
    Consistency is the documented MinHash estimator — bounds-checked."""
    res = adaptive_digest(
        spark, topic_site, "http://site.test/", "spark streaming watermark state",
        str(tmp_path / "par"),
        AdaptiveConfig(top_k_links=2, max_depth=5, max_pages=6,
                       confidence_threshold=1.0, saturation_threshold=1.01,
                       min_gain_threshold=0.0),
    )
    kb = [(r.url, r.text, r.wave) for r in res.knowledge_base.collect()]
    q = _clean_tokens("spark streaming watermark state")
    metrics = [r.asDict() for r in res.metrics.collect()]
    assert [m["wave"] for m in metrics] == list(range(len(metrics)))
    history = []
    seen = set()
    for m in metrics:
        docs = [(u, t) for u, t, w in kb if w <= m["wave"]]
        assert m["pages_crawled"] == len(docs)
        new_terms = {t for _, txt in docs for t in _clean_tokens(txt)} - seen
        if m["n_new_docs"] > 0:
            assert m["new_terms"] == len(new_terms)
            history.append(m["new_terms"])
            seen |= new_terms
        # coverage mirror (:328-367)
        tf, df = {}, {}
        for _, txt in docs:
            toks = _clean_tokens(txt)
            for t in toks:
                if t in q:
                    tf[t] = tf.get(t, 0) + 1
            for t in set(toks):
                if t in q:
                    df[t] = df.get(t, 0) + 1
        max_tf = max(tf.values(), default=0)
        total = sum(
            (df[t] / len(docs)) * (1 + (0.5 * math.log(1 + tf[t]) / math.log(1 + max_tf) if max_tf > 0 else 0))
            for t in set(q) if t in df
        )
        want_cov = min(math.sqrt(total / len(set(q))), 1.0)
        assert m["coverage"] == pytest.approx(want_cov)
        assert m["saturation"] == pytest.approx(saturation_stat(history))
        assert 0.0 <= m["consistency"] <= 1.0
        assert m["confidence"] == pytest.approx(
            0.4 * m["coverage"] + 0.3 * m["consistency"] + 0.3 * m["saturation"]
        )


def test_digest_stop_reasons(spark, topic_site, tmp_path):
    # max_pages: threshold unreachable, page budget 2
    res = adaptive_digest(
        spark, topic_site, "http://site.test/", "spark streaming",
        str(tmp_path / "mp"),
        AdaptiveConfig(top_k_links=1, max_depth=9, max_pages=2,
                       confidence_threshold=1.0, saturation_threshold=1.01,
                       min_gain_threshold=0.0),
    )
    assert res.stop_reason == "max_pages" and res.pages_crawled == 2

    # min_gain: impossible gain bar stops before any expansion
    res = adaptive_digest(
        spark, topic_site, "http://site.test/", "spark streaming",
        str(tmp_path / "mg"),
        AdaptiveConfig(top_k_links=1, max_depth=9, confidence_threshold=1.0,
                       saturation_threshold=1.01, min_gain_threshold=1.0),
    )
    assert res.stop_reason == "min_gain" and res.pages_crawled == 1

    # frontier_exhausted: leaf page has no links
    res = adaptive_digest(
        spark, topic_site, "http://site.test/cooking", "banana bread",
        str(tmp_path / "fe"),
        AdaptiveConfig(top_k_links=3, max_depth=9, confidence_threshold=1.0,
                       saturation_threshold=1.01, min_gain_threshold=0.0),
    )
    assert res.stop_reason == "frontier_exhausted" and res.pages_crawled == 1

    # missing seed page = failed initial fetch → empty KB, empty frontier
    res = adaptive_digest(
        spark, topic_site, "http://site.test/nope", "anything",
        str(tmp_path / "miss"),
        AdaptiveConfig(),
    )
    assert res.stop_reason == "frontier_exhausted"
    assert res.pages_crawled == 0 and res.confidence == 0.0


def test_digest_resume_equals_single_run(spark, topic_site, tmp_path):
    """Kill-and-resume: a digest stopped early (max_depth=1) and resumed
    with the full config lands on the same crawled set, metrics trail and
    confidence as one uninterrupted run."""
    cfg = AdaptiveConfig(top_k_links=1, max_depth=3, confidence_threshold=1.0,
                         saturation_threshold=1.01, min_gain_threshold=0.0)
    full = adaptive_digest(
        spark, topic_site, "http://site.test/", "spark streaming watermark",
        str(tmp_path / "full"), cfg,
    )

    half_cfg = AdaptiveConfig(**{**cfg.__dict__, "max_depth": 1})
    adaptive_digest(
        spark, topic_site, "http://site.test/", "spark streaming watermark",
        str(tmp_path / "resume"), half_cfg,
    )
    resumed = adaptive_digest(
        spark, topic_site, "http://site.test/", "spark streaming watermark",
        str(tmp_path / "resume"), cfg, resume=True,
    )
    assert resumed.crawl_order == full.crawl_order
    assert resumed.confidence == pytest.approx(full.confidence)
    assert [r.asDict() for r in resumed.metrics.collect()] == [
        r.asDict() for r in full.metrics.collect()
    ]


def _ref_rank(pending, crawled, seen_terms, kb_empty, query, cfg):
    """Driver-side mirror of StatisticalStrategy.rank_links (:413-496)
    under the engine's documented tokenizer + per-href-max contract."""
    q = set(_clean_tokens(query))
    best = {}
    for href, text, title in pending:
        if href in crawled:
            continue
        link_terms = set(_clean_tokens(" ".join(filter(None, [text, title]))))
        relevance = len(q & link_terms) / len(q) if q and link_terms else 0.0
        if kb_empty:
            novelty = 1.0
        elif not link_terms:
            novelty = 0.5
        else:
            novelty = len(link_terms - seen_terms) / len(link_terms)
        score = (cfg.relevance_weight * relevance
                 + cfg.novelty_weight * novelty
                 + cfg.authority_weight * 1.0)
        best[href] = max(best.get(href, -1.0), score)
    return sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))


def test_rank_pending_links_matches_reference_formula(spark):
    cfg = AdaptiveConfig()
    pending = [
        ("http://a/1", "spark streaming watermark guide", "docs"),
        ("http://a/2", "banana bread recipe", None),
        ("http://a/3", "", ""),
        ("http://a/2", "spark banana", "dup instance scores higher"),
        ("http://a/seen", "spark streaming", "already crawled"),
    ]
    crawled = {"http://a/seen"}
    seen_terms = {"spark", "streaming", "guide", "already"}
    query = "spark streaming watermark"

    links = spark.createDataFrame(
        [(h, t, ti, "http://a/", 0) for h, t, ti in pending],
        "href string, text string, title string, parent_url string, wave int",
    )
    got = rank_pending_links(
        links,
        spark.createDataFrame([(u,) for u in crawled], "url string"),
        spark.createDataFrame([(t,) for t in seen_terms], "term string"),
        _clean_tokens(query),
        cfg,
        kb_empty=False,
    ).collect()
    want = _ref_rank(pending, crawled, seen_terms, False, query, cfg)
    assert [(r.href, round(r.expected_gain, 9)) for r in got] == [
        (h, round(s, 9)) for h, s in want
    ]
    # kb-empty branch: novelty pinned to 1.0
    got0 = rank_pending_links(
        links,
        spark.createDataFrame([(u,) for u in crawled], "url string"),
        None,
        _clean_tokens(query),
        cfg,
        kb_empty=True,
    ).collect()
    want0 = _ref_rank(pending, crawled, set(), True, query, cfg)
    assert [(r.href, round(r.expected_gain, 9)) for r in got0] == [
        (h, round(s, 9)) for h, s in want0
    ]


def test_saturation_stat_reference_edges():
    """adaptive_crawler.py:396-411 edge semantics."""
    assert saturation_stat([]) == 0.0
    assert saturation_stat([50]) == 0.0          # <2 history → 0.0
    assert saturation_stat([100, 10]) == 0.9
    assert saturation_stat([100, 0]) == pytest.approx(1 - 1 / 100)  # zero clamps to 1
    assert saturation_stat([0, 10]) == 0.0       # initial clamps to 1, floor at 0
    assert saturation_stat([10, 20]) == 0.0      # growing discovery → no saturation


def test_digest_plans_have_no_per_row_python(spark, topic_site, tmp_path):
    """The ranking plan stays JVM-side (extraction's pandas UDF is the
    only sanctioned Arrow stage; ranking itself must be pure codegen)."""
    links = spark.createDataFrame(
        [("http://a/1", "spark text", "t", "http://a/", 0)],
        "href string, text string, title string, parent_url string, wave int",
    )
    ranked = rank_pending_links(
        links,
        spark.createDataFrame([("http://x",)], "url string"),
        spark.createDataFrame([("spark",)], "term string"),
        ["spark"],
        AdaptiveConfig(),
        kb_empty=False,
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
