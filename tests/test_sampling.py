"""token_budget_sample vs a pure-Python reference of the semantic: per
source, md5-rank docs, keep while the PRIOR cumulative token count is
strictly under the budget."""
import hashlib
import random

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.sampling import token_budget_sample


def _ref_sample(rows, budgets, default):
    # rows: list of (doc_id, source, text)
    by_src = {}
    for doc_id, source, text in rows:
        by_src.setdefault(source, []).append((doc_id, text))
    kept = set()
    for source, docs in by_src.items():
        budget = budgets.get(source, default)
        if budget is None:
            continue
        docs.sort(key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0]))
        acc = 0
        for doc_id, text in docs:
            nt = len(text.split()) if text.strip() else 0
            if acc < budget:
                kept.add(doc_id)
            acc += nt
    return kept


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(7)
    rows = []
    for i in range(900):
        src = f"s{rng.randrange(6)}"
        nwords = rng.choice([0, 1, 3, 8, 20, 55])
        rows.append((i, src, " ".join(f"w{rng.randrange(40)}" for _ in range(nwords))))
    return rows


def test_matches_reference_mixed_budgets(spark, corpus):
    budgets = {"s0": 0, "s1": 17, "s2": 10**9, "s3": 333}
    out = token_budget_sample(_mk(spark, corpus), budgets, default_budget=101)
    got = {r.doc_id for r in out.select("doc_id").collect()}
    assert got == _ref_sample(corpus, budgets, 101)


def test_no_default_drops_unbudgeted_sources(spark, corpus):
    budgets = {"s0": 50, "s5": 10**9}
    out = token_budget_sample(_mk(spark, corpus), budgets)
    got = {(r.source, r.doc_id) for r in out.select("source", "doc_id").collect()}
    assert {s for s, _ in got} <= {"s0", "s5"}
    assert {d for _, d in got} == _ref_sample(corpus, budgets, None)


def test_overshoot_at_most_one_doc(spark, corpus):
    budgets = {f"s{i}": 200 for i in range(6)}
    out = token_budget_sample(_mk(spark, corpus), budgets)
    per = (
        out.groupBy("source")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    assert per
    for r in per:
        assert r.tot < 200 + r.mx + 1


def test_zero_budget_and_empty_text(spark):
    rows = [(1, "a", ""), (2, "a", "   "), (3, "b", "x y")]
    out = token_budget_sample(_mk(spark, rows), {"a": 0}, default_budget=5)
    got = {r.doc_id for r in out.collect()}
    # zero-token docs in a still-open budget are kept (prior 0 < 5)
    assert got == {3}
    out2 = token_budget_sample(_mk(spark, rows), {"a": 1})
    # budget 1 keeps md5-ranked docs while prior < 1: both zero-token docs
    assert {r.doc_id for r in out2.collect()} == _ref_sample(rows, {"a": 1}, None)


def test_requires_some_budget(spark):
    with pytest.raises(ValueError):
        token_budget_sample(_mk(spark, [(1, "a", "x")]), {})


def test_keeps_input_columns_and_n_tokens(spark):
    rows = [(1, "a", "one two three")]
    out = token_budget_sample(_mk(spark, rows), {"a": 10})
    row = out.collect()[0]
    assert row.text == "one two three" and row.n_tokens == 3
    assert set(out.columns) == {"doc_id", "source", "text", "n_tokens"}


def test_boundary_window_sees_only_sliver(spark, corpus):
    """Plan shape: the running-sum window must be partitioned by
    (source, _bucket) — never by source alone (that would be one task
    per source at scale)."""
    out = token_budget_sample(_mk(spark, corpus), {}, default_budget=300)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_bucket" in line, line


# ── temperature budgets ──────────────────────────────────────────────────


def test_temperature_budgets_known_shares(spark):
    from crawl4ai_spark.operators.sampling import temperature_budgets

    # token totals: a=9, b=16, c=25  → sqrt shares 3/4/5 of 12
    rows = [
        (1, "a", "w " * 8 + "w"), (2, "b", "w " * 15 + "w"),
        (3, "c", "w " * 24 + "w"),
    ]
    docs = _mk(spark, rows)
    tb = temperature_budgets(docs, total_tokens=1200, alpha=0.5, granularity=1)
    assert tb == {"a": 300, "b": 400, "c": 500}
    # granularity floors each budget to a multiple
    tb8 = temperature_budgets(docs, total_tokens=1201, alpha=0.5, granularity=8)
    assert all(v % 8 == 0 for v in tb8.values())
    assert tb8 == {"a": 296, "b": 400, "c": 496}


def test_temperature_budgets_alpha_extremes(spark):
    from crawl4ai_spark.operators.sampling import temperature_budgets

    rows = [(1, "a", "w"), (2, "b", "w " * 98 + "w")]
    docs = _mk(spark, rows)
    # alpha=1 → natural proportions (1:99)
    t1 = temperature_budgets(docs, 1000, alpha=1.0, granularity=1)
    assert t1 == {"a": 10, "b": 990}
    # alpha=0 → uniform regardless of size
    t0 = temperature_budgets(docs, 1000, alpha=0.0, granularity=1)
    assert t0 == {"a": 500, "b": 500}
    # empty-text source gets 0 weight even at alpha=0
    rows2 = rows + [(3, "z", "")]
    tz = temperature_budgets(_mk(spark, rows2), 1000, alpha=0.0, granularity=1)
    assert tz["z"] == 0 and tz["a"] == 500
    with pytest.raises(ValueError):
        temperature_budgets(docs, 1000, alpha=-0.1)
    with pytest.raises(ValueError):
        temperature_budgets(docs, 1000, granularity=0)


def test_temperature_budgets_compose_with_sampler(spark):
    """The dict plugs straight into token_budget_sample; per-source kept
    tokens respect the derived budget + ≤1-doc overshoot rule."""
    from crawl4ai_spark.operators.sampling import (
        temperature_budgets,
        token_budget_sample,
    )

    rows = [(i, f"s{i % 3}", "w " * (5 + i % 7)) for i in range(60)]
    docs = _mk(spark, rows)
    tb = temperature_budgets(docs, total_tokens=120, alpha=0.5)
    out = token_budget_sample(docs, tb)
    per = {
        r["source"]: r["tok"]
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    max_doc = 12  # max tokens of any single doc in this corpus
    for s, b in tb.items():
        if b > 0:
            assert per.get(s, 0) < b + max_doc
