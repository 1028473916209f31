"""Recrawl scheduling (operators/recrawl.py) — Cho & Garcia-Molina
change-rate estimation + Poisson staleness priority.

Pins the closed form against hand-computed values and the NULL contract
(insufficient history), and cross-checks a randomized corpus against a
pure-Python reimplementation of the estimator.
"""

import math

import pyspark.sql.functions as F
import pytest

from crawl4ai_spark.operators.recrawl import change_rate_estimates


def _visits_df(spark, rows):
    df = spark.createDataFrame(rows, "url string, s double, changed boolean")
    return df.select(
        "url", F.timestamp_seconds(F.col("s")).alias("visit_ts"), "changed"
    )


def _cho_gm(n, x, first_s, last_s, now_s):
    """Pure-Python reference for the estimator + staleness probability."""
    if n < 2 or last_s <= first_s:
        return None, None
    ibar = (last_s - first_s) / (n - 1)
    lam = -math.log((n - x + 0.5) / (n + 0.5)) / ibar
    p = 1.0 - math.exp(-lam * (now_s - last_s))
    return round(lam * 86400.0, 6), round(p, 6)


def test_hand_computed_two_urls(spark):
    # url a: 3 visits at t=0, 100, 200 (I=100s), 1 change observed.
    # url b: 2 visits at t=0, 400, both changed.
    # now = global max ts = 400 → a's age 200, b's age 0.
    rows = [
        ("a", 0.0, False),
        ("a", 100.0, True),
        ("a", 200.0, False),
        ("b", 0.0, True),
        ("b", 400.0, True),
    ]
    got = {
        r["url"]: r
        for r in change_rate_estimates(_visits_df(spark, rows)).collect()
    }
    lam_a, p_a = _cho_gm(3, 1, 0.0, 200.0, 400.0)
    lam_b, p_b = _cho_gm(2, 2, 0.0, 400.0, 400.0)
    assert got["a"]["n_visits"] == 3 and got["a"]["n_changed"] == 1
    assert got["a"]["lambda_per_day"] == pytest.approx(lam_a, abs=1e-6)
    assert got["a"]["p_changed"] == pytest.approx(p_a, abs=1e-6)
    assert got["b"]["lambda_per_day"] == pytest.approx(lam_b, abs=1e-6)
    # b was just visited: staleness probability exactly 0 at age 0
    assert got["b"]["p_changed"] == 0.0 == p_b


def test_insufficient_history_is_null(spark):
    # single visit, and repeated visits at one instant: no estimate
    rows = [
        ("one", 50.0, True),
        ("same", 10.0, False),
        ("same", 10.0, True),
        ("ok", 0.0, True),
        ("ok", 60.0, False),
    ]
    got = {
        r["url"]: r
        for r in change_rate_estimates(_visits_df(spark, rows)).collect()
    }
    for u in ("one", "same"):
        assert got[u]["lambda_per_day"] is None
        assert got[u]["p_changed"] is None
    assert got["ok"]["lambda_per_day"] is not None


def test_more_observed_changes_means_higher_rate(spark):
    # identical visit grids, different change counts → lambda ordering
    rows = []
    for u, changes in (("lo", 1), ("mid", 3), ("hi", 5)):
        for j in range(6):
            rows.append((u, j * 3600.0, j < changes))
    got = {
        r["url"]: r["lambda_per_day"]
        for r in change_rate_estimates(_visits_df(spark, rows)).collect()
    }
    assert got["lo"] < got["mid"] < got["hi"]


def test_randomized_vs_python_reference(spark):
    import random

    rng = random.Random(20260819)
    rows, expect = [], {}
    all_ts = []
    for i in range(60):
        u = f"http://h{i % 7}.test/p{i}"
        n = rng.randint(1, 8)
        ts = sorted(rng.sample(range(0, 10_000_000), n))
        ch = [rng.random() < 0.4 for _ in range(n)]
        rows += [(u, float(t), c) for t, c in zip(ts, ch)]
        all_ts += ts
        expect[u] = (n, sum(ch), float(ts[0]), float(ts[-1]))
    now_s = float(max(all_ts))
    got = {
        r["url"]: r
        for r in change_rate_estimates(_visits_df(spark, rows)).collect()
    }
    assert set(got) == set(expect)
    for u, (n, x, first, last) in expect.items():
        lam, p = _cho_gm(n, x, first, last, now_s)
        r = got[u]
        assert r["n_visits"] == n and r["n_changed"] == x
        if lam is None:
            assert r["lambda_per_day"] is None and r["p_changed"] is None
        else:
            assert r["lambda_per_day"] == pytest.approx(lam, abs=1e-6)
            assert r["p_changed"] == pytest.approx(p, abs=1e-6)


def test_explicit_now_column(spark):
    rows = [("a", 0.0, True), ("a", 100.0, False)]
    df = _visits_df(spark, rows)
    got = change_rate_estimates(df, now=F.lit(300.0)).collect()[0]
    lam, p = _cho_gm(2, 1, 0.0, 100.0, 300.0)
    assert got["lambda_per_day"] == pytest.approx(lam, abs=1e-6)
    assert got["p_changed"] == pytest.approx(p, abs=1e-6)
