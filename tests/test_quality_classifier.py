"""quality_classifier (GPT-3 appendix A filtering) — shared featurize/
lr_train core, distributed fixed-order-fold scoring parity against a
pure-Python mirror, and the Pareto(9) keep rule."""
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.quality_classifier import (
    featurize,
    fit_quality_classifier,
    lr_train,
    pareto_select,
    score_quality,
)

B = 64


def _py_score(text, weights, bias, round_to=6):
    """Driver-side mirror of score_quality's fold: bias + sum over
    bucket-ascending terms w[b] * (c/tot) — the same IEEE sequence."""
    counts = featurize(text, len(weights))
    if not counts:
        return 0, round(1.0 / (1.0 + math.exp(-bias)), round_to)
    tot = float(sum(counts.values()))
    acc = float(bias)
    for b in sorted(counts):
        acc = acc + weights[b] * (counts[b] / tot)
    return int(sum(counts.values())), round(1.0 / (1.0 + math.exp(-acc)), round_to)


def test_featurize_hand_check():
    got = featurize("The cat SAT... the cat!", 1024)
    # cleaned: "the cat sat the cat" -> unigrams x5 + bigrams x4
    grams = ["the", "cat", "sat", "the", "cat",
             "the cat", "cat sat", "sat the", "the cat"]
    want = {}
    for g in grams:
        b = int(hashlib.md5(g.encode()).hexdigest()[:13], 16) % 1024
        want[b] = want.get(b, 0) + 1
    assert got == want
    assert featurize("a b c !!", 64) == {}  # all tokens <= 2 chars


def test_lr_train_separates_and_is_deterministic():
    pos = [featurize(f"good clean wholesome text number{'x' * i}", B) for i in range(20)]
    neg = [featurize(f"spam junk garbage noise number{'y' * i}", B) for i in range(20)]
    rows, labels = pos + neg, [1] * 20 + [0] * 20
    w1, b1 = lr_train(rows, labels, B, iters=300)
    w2, b2 = lr_train(rows, labels, B, iters=300)
    assert w1 == w2 and b1 == b2  # bit-identical retrain
    import numpy as np

    def score(c):
        tot = sum(c.values()) or 1
        return 1 / (1 + np.exp(-(b1 + sum(w1[k] * v / tot for k, v in c.items()))))

    assert min(score(c) for c in pos) > max(score(c) for c in neg)


def test_score_quality_matches_python_mirror(spark):
    rows = [(i, f"the quick brown fox number {'word' + 'z' * i} jumps") for i in range(30)]
    rows.append((99, "!! ?? .."))  # zero-feature doc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w, bias = fit_quality_classifier(df, F.col("doc_id") % 2 == 0, n_buckets=B, sample=20, iters=50)
    got = {r["doc_id"]: r for r in score_quality(df, w, bias).collect()}
    assert len(got) == 31
    for doc_id, text in rows:
        n, s = _py_score(text, w, bias)
        assert got[doc_id]["n_grams"] == n
        assert got[doc_id]["qc_score"] == pytest.approx(s, abs=0)  # exact


def test_pareto_select_rule(spark):
    df = spark.createDataFrame(
        [(1, 0.999999), (2, 0.000001)], "doc_id long, qc_score double"
    )
    out = {r["doc_id"]: r for r in pareto_select(df, alpha=9.0, seed="qc").collect()}
    for doc_id, score in [(1, 0.999999), (2, 0.000001)]:
        h = int(hashlib.md5(f"qc:{doc_id}".encode()).hexdigest()[:13], 16)
        u = (float(h) + 0.5) / float(16**13)
        draw = round((1.0 - u) ** (-1.0 / 9.0) - 1.0, 6)
        assert out[doc_id]["pareto_draw"] == pytest.approx(draw, abs=0)
        assert out[doc_id]["keep"] == int(draw > round(1.0 - score, 6))
    # a ~1.0 score is (almost) always kept: draw > ~0 for any u > 0
    assert out[1]["keep"] == 1


def test_pareto_alpha_validation(spark):
    df = spark.createDataFrame([(1, 0.5)], "doc_id long, qc_score double")
    with pytest.raises(ValueError):
        pareto_select(df, alpha=0.0)


def test_end_to_end_separates_languages(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w, bias = fit_quality_classifier(docs, F.col("lang") == "en", n_buckets=256, sample=50, iters=100)
    scored = score_quality(docs, w, bias).join(docs.select("doc_id", "lang"), "doc_id")
    rows = scored.groupBy(F.col("lang") == "en").agg(F.avg("qc_score").alias("m")).collect()
    m = {r[0]: r["m"] for r in rows}
    assert m[True] > m[False]


def test_determinism_across_parallelism(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w, bias = fit_quality_classifier(docs, F.col("lang") == "en", n_buckets=B, sample=30, iters=50)
    a = sorted(map(tuple, pareto_select(score_quality(docs, w, bias)).collect()))
    b = sorted(map(tuple, pareto_select(score_quality(docs.repartition(11), w, bias)).collect()))
    assert a == b
    # refit from the repartitioned frame: same hash-ordered sample
    w2, bias2 = fit_quality_classifier(
        docs.repartition(11), F.col("lang") == "en", n_buckets=B, sample=30, iters=50
    )
    assert w == w2 and bias == bias2


def test_score_n_buckets_mismatch_raises(spark):
    df = spark.createDataFrame([(1, "text")], "doc_id long, text string")
    with pytest.raises(ValueError):
        score_quality(df, [0.0] * 8, 0.0, n_buckets=16)
