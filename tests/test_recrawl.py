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


def test_revisit_seeds_budget_and_ranking(spark):
    from crawl4ai_spark.operators.recrawl import revisit_seeds

    # hot: 4 visits all changed, last long ago → high p
    # cold: 4 visits none changed → low p
    # unknown: 1 visit → unestimable → fail-open priority 1.0, ranks first
    rows = (
        [("hot", t, True) for t in (0.0, 100.0, 200.0, 300.0)]
        + [("cold", t, False) for t in (0.0, 100.0, 200.0, 300.0)]
        + [("unknown", 500.0, True)]
    )
    out = revisit_seeds(_visits_df(spark, rows), budget=2, horizon_s=0.0).collect()
    assert [r["url"] for r in out] == ["unknown", "hot"]
    assert out[0]["priority"] == 1.0 and out[0]["p_changed"] is None
    assert 0.0 < out[1]["priority"] < 1.0


def test_revisit_seeds_value_weighting_and_plan(spark):
    from crawl4ai_spark.operators.recrawl import revisit_seeds

    rows = [
        ("a", 0.0, True), ("a", 100.0, True),
        ("b", 0.0, True), ("b", 100.0, True),
        ("clock", 300.0, False),  # pushes "now" past a/b's last visit
    ]
    df = _visits_df(spark, rows)
    # identical histories; value prior breaks the tie toward b ("clock"
    # has no value row → coalesces to 0.0 and drops out)
    value = spark.createDataFrame([("a", 0.5), ("b", 2.0)], "url string, value double")
    out = revisit_seeds(df, budget=1, value=value)
    assert [r["url"] for r in out.collect()] == ["b"]
    # the cut must be a partial top-k, not a global sort shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_revisit_closes_loop_with_revalidate(spark):
    """End-to-end seam: revalidate() snapshots accumulate into a visit
    history; revisit_seeds spends the budget on the URLs that changed."""
    from crawl4ai_spark.operators.cache import head_fingerprint_col, revalidate
    from crawl4ai_spark.operators.recrawl import revisit_seeds

    def snap(changed_urls, ts):
        rows = [
            (u, f"<html><head><title>{u}{' v'+str(ts) if u in changed_urls else ''}"
                f"</title></head><body>x</body></html>")
            for u in ("u1", "u2", "u3", "u4")
        ]
        df = spark.createDataFrame(rows, "url string, html string")
        return df.select(
            "url", head_fingerprint_col(F.col("html")).alias("head_fingerprint")
        )

    base = snap(set(), 0)
    visits = []
    for ts, changed in ((100.0, {"u2"}), (200.0, {"u2", "u4"})):
        rv = revalidate(base, snap(changed, int(ts)))
        visits.append(
            rv.select(
                "url",
                F.timestamp_seconds(F.lit(ts)).alias("visit_ts"),
                (F.col("cache_status") == "stale").alias("changed"),
            )
        )
    history = visits[0].unionByName(visits[1])
    seeds = revisit_seeds(history, budget=2).collect()
    assert {r["url"] for r in seeds} == {"u2", "u4"}
