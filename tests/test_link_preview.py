"""Link preview contextual scoring — head-data BM25 + blend semantics
(reference link_preview.py:190-331, async_url_seeder.py:1466-1748)."""

from pyspark.sql import functions as F


def test_bm25_contextual_scores_properties():
    from crawl4ai_spark.extraction.scrape import bm25_contextual_scores

    # empty input conventions
    assert bm25_contextual_scores("q", []) == []
    assert bm25_contextual_scores("", ["a", "b"]) == [0.0, 0.0]
    assert bm25_contextual_scores("q", ["", "   "]) == [0.0, 0.0]
    # all-equal raw scores → 0.5 each (reference min-max convention)
    assert bm25_contextual_scores("zzz", ["alpha beta", "gamma delta"]) == [0.5, 0.5]
    # matching doc normalizes to 1.0, non-matching (score 0) to 0.0
    got = bm25_contextual_scores("spark", ["spark handbook guide", "other filler words", "plain boring anchor"])
    assert got[0] == 1.0 and got[1] == 0.0 and got[2] == 0.0
    # more query-term occurrences rank higher pre-normalization
    got = bm25_contextual_scores("spark", ["spark spark spark here", "one spark mention yes", "none at all here"])
    assert got[0] == 1.0 and 0.0 < got[1] < 1.0 and got[2] == 0.0


def test_bm25_contextual_negative_idf_epsilon_floor():
    """A term in >half the corpus has negative raw IDF; rank_bm25 floors
    it at ε·avg-idf (positive when the vocab average is positive), so the
    matching docs must still outrank the non-matching one."""
    from crawl4ai_spark.extraction.scrape import bm25_contextual_scores

    docs = ["common alpha", "common beta", "common gamma", "rare delta"]
    got = bm25_contextual_scores("common", docs)
    assert got[3] == 0.0
    assert all(g > 0.0 for g in got[:3])


def test_link_preview_missing_head_falls_back_to_intrinsic(spark):
    """A link whose target has no page row (or an empty head) gets
    contextual NULL and total = clamped intrinsic — the reference's
    unscored-link ladder (utils.py:3459-3504 case 2)."""
    from crawl4ai_spark.operators.link_preview import link_preview_scores

    pages = spark.createDataFrame(
        [
            ("http://x.test/a", b"<html><head><title>spark tuning guide</title></head><body>.</body></html>"),
            ("http://x.test/b", b"<html><head><title>cooking recipes</title></head><body>.</body></html>"),
            ("http://x.test/c", b"<html><head><title>garden tools list</title></head><body>.</body></html>"),
            ("http://x.test/nohead", b"<html><body>no head here</body></html>"),
        ],
        "url string, html binary",
    )
    links = spark.createDataFrame(
        [("http://x.test/a", 4.0), ("http://x.test/b", 2.0), ("http://x.test/c", 1.0),
         ("http://x.test/nohead", 3.0), ("http://x.test/missing", 12.5)],
        "href string, intrinsic_score double",
    )
    out = {
        r.href: r
        for r in link_preview_scores(links, pages, "spark guide", intrinsic_col="intrinsic_score").collect()
    }
    assert out["http://x.test/a"].contextual_score == 1.0
    assert out["http://x.test/b"].contextual_score == 0.0
    assert out["http://x.test/nohead"].contextual_score is None
    assert out["http://x.test/nohead"].total_score == 3.0
    # intrinsic clamp to 10 on the fallback path
    assert out["http://x.test/missing"].contextual_score is None
    assert out["http://x.test/missing"].total_score == 10.0
    # blend on the scored path: 0.7·4 + 0.3·10·1.0
    assert abs(out["http://x.test/a"].total_score - (0.7 * 4.0 + 3.0)) < 1e-9


def test_link_preview_all_equal_scores_half(spark):
    from crawl4ai_spark.operators.link_preview import link_preview_scores

    pages = spark.createDataFrame(
        [("http://x.test/a", b"<html><head><title>same words</title></head><body>.</body></html>"),
         ("http://x.test/b", b"<html><head><title>same words</title></head><body>.</body></html>")],
        "url string, html binary",
    )
    links = spark.createDataFrame(
        [("http://x.test/a",), ("http://x.test/b",)], "href string"
    )
    out = link_preview_scores(links, pages, "words").collect()
    assert all(abs(r.contextual_score - 0.5) < 1e-12 for r in out)


def test_link_preview_head_data_map(spark):
    from crawl4ai_spark.operators.link_preview import link_preview_scores

    pages = spark.createDataFrame(
        [("http://x.test/a",
          b'<html><head><title>spark tuning</title><meta name="description" content="go fast"></head><body>.</body></html>'),
         ("http://x.test/b", b"<html><head><title>slow cooking</title></head><body>.</body></html>"),
         ("http://x.test/c", b"<html><head><title>garden tools</title></head><body>.</body></html>")],
        "url string, html binary",
    )
    links = spark.createDataFrame(
        [("http://x.test/a",), ("http://x.test/b",), ("http://x.test/c",)], "href string"
    )
    out = {
        r.href: r
        for r in link_preview_scores(links, pages, "spark", include_head_data=True).collect()
    }
    assert out["http://x.test/a"].head_data["title"] == "spark tuning"
    assert out["http://x.test/a"].head_data["description"] == "go fast"
    assert out["http://x.test/a"].contextual_score == 1.0


def test_okapi_bm25_query_term_multiplicity(spark):
    """rank_bm25 iterates the query WITH multiplicity: 'alpha alpha'
    must score exactly 2x 'alpha' per doc (same term, weight doubled)."""
    from crawl4ai_spark.operators.link_preview import okapi_bm25

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha delta"), (3, "epsilon zeta")],
        "id long, text string",
    )
    single = {r.id: r.bm25_raw for r in okapi_bm25(docs, "alpha").collect()}
    double = {r.id: r.bm25_raw for r in okapi_bm25(docs, "alpha alpha").collect()}
    for i in (1, 2, 3):
        assert abs(double[i] - 2 * single[i]) < 1e-9
    # and a mixed query is the weighted sum of its parts
    beta = {r.id: r.bm25_raw for r in okapi_bm25(docs, "beta").collect()}
    mixed = {r.id: r.bm25_raw for r in okapi_bm25(docs, "alpha alpha beta").collect()}
    for i in (1, 2, 3):
        assert abs(mixed[i] - (2 * single[i] + beta[i])) < 1e-9


def test_calculate_total_score_reference_regression_cases():
    """The four calculate_total_score cases from the reference's own
    tests/test_merge_head_data_scoring.py (regression for its issue
    #1749) — pinned verbatim against our link_total_score."""
    from crawl4ai_spark.extraction.scrape import link_total_score

    # intrinsic only → passthrough
    assert link_total_score(5.0, None, score_links_enabled=True, query_provided=True) == 5.0
    # scoring disabled → neutral 5.0 regardless of inputs
    assert link_total_score(8.0, 0.5, score_links_enabled=False, query_provided=True) == 5.0
    # both → 0.7·intrinsic + 0.3·(contextual·10): 5.6 + 1.5
    assert abs(link_total_score(8.0, 0.5, score_links_enabled=True, query_provided=True) - 7.1) < 0.01
    # nothing → 0.0
    assert link_total_score(None, None, score_links_enabled=True, query_provided=False) == 0.0


def test_okapi_bm25_zero_token_docs_in_corpus_and_output(spark):
    """rank_bm25 counts empty token lists in corpus_size/avgdl and scores
    them 0; okapi_bm25 must emit those docs (score 0) and include them in
    the corpus stats rather than silently excluding them."""
    from crawl4ai_spark.operators.link_preview import okapi_bm25

    rows = [(1, "spark table scan"), (2, ""), (3, None), (4, "scan scan merge")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.bm25_raw for r in okapi_bm25(df, "scan").collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == 0.0 and got[3] == 0.0
    # python recomputation with rank_bm25's exact semantics (n=4 docs,
    # avgdl over all four including the empty ones)
    import math

    corpus = [r[1].lower().split() if r[1] else [] for r in rows]
    n = len(corpus)
    avgdl = sum(len(c) for c in corpus) / n
    df_scan = sum(1 for c in corpus if "scan" in c)
    idf = {}
    vocab = {t for c in corpus for t in c}
    neg = []
    for t in vocab:
        d = sum(1 for c in corpus if t in c)
        v = math.log(n - d + 0.5) - math.log(d + 0.5)
        idf[t] = v
        if v < 0:
            neg.append(t)
    avg_idf = sum(idf.values()) / len(idf)
    for t in neg:
        idf[t] = 0.25 * avg_idf
    for i, c in enumerate(corpus):
        tf = c.count("scan")
        want = idf["scan"] * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(c) / avgdl)) if tf else 0.0
        assert abs(got[rows[i][0]] - want) < 1e-9, (rows[i][0], got[rows[i][0]], want)
