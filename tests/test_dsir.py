"""dsir_log_weights / dsir_select vs an independent pure-Python DSIR
reference (hashed unigram+bigram features, smoothed log-ratio weights,
Gumbel top-k)."""
import hashlib
import math
import random
import re

import pytest

from crawl4ai_spark.operators.sampling import dsir_log_weights, dsir_select


def _grams(text):
    t = re.sub(r"[^a-z0-9 ]", "", text.lower()).strip()
    toks = [w for w in re.split(r"\s+", t) if len(w) > 2]
    return toks + [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]


def _bucket(g, B):
    return int(hashlib.md5(g.encode()).hexdigest()[:13], 16) % B


def _ref_weights(raw_rows, target_rows, B, a):
    q, p, dc = {}, {}, {}
    for doc_id, text in raw_rows:
        for g in _grams(text):
            b = _bucket(g, B)
            q[b] = q.get(b, 0) + 1
            dc.setdefault(doc_id, {})
            dc[doc_id][b] = dc[doc_id].get(b, 0) + 1
    for _, text in target_rows:
        for g in _grams(text):
            b = _bucket(g, B)
            p[b] = p.get(b, 0) + 1
    qt, pt = sum(q.values()), sum(p.values())
    out = {}
    for doc_id, counts in dc.items():
        if not counts:
            continue
        out[doc_id] = sum(
            c
            * (
                math.log((p.get(b, 0) + a) / (pt + a * B))
                - math.log((q[b] + a) / (qt + a * B))
            )
            for b, c in counts.items()
        )
    return out


WORDS_EN = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs", "with", "style"]
WORDS_OTHER = ["zorp", "blik", "quux", "flarn", "mizzle", "grot", "snib", "vex", "plon", "drub"]


@pytest.fixture(scope="module")
def corpora():
    rng = random.Random(11)
    raw = []
    for i in range(300):
        pool = WORDS_EN if i % 3 == 0 else WORDS_OTHER
        raw.append((i, " ".join(rng.choice(pool) for _ in range(rng.randrange(0, 25)))))
    target = [
        (1000 + i, " ".join(random.Random(100 + i).choice(WORDS_EN) for _ in range(15)))
        for i in range(40)
    ]
    return raw, target


def _dfs(spark, corpora):
    raw, target = corpora
    schema = "doc_id long, text string"
    return spark.createDataFrame(raw, schema), spark.createDataFrame(target, schema)


def test_log_weights_match_reference(spark, corpora):
    raw_df, target_df = _dfs(spark, corpora)
    got = {
        r.doc_id: r.logw
        for r in dsir_log_weights(raw_df, target_df, n_buckets=64).collect()
    }
    ref = _ref_weights(*corpora, 64, 0.5)
    assert set(got) == set(ref)
    for d, v in ref.items():
        assert got[d] == pytest.approx(v, abs=1e-9)


def test_select_prefers_target_like_docs(spark, corpora):
    raw_df, target_df = _dfs(spark, corpora)
    top = dsir_select(raw_df, target_df, 50, n_buckets=64).collect()
    assert len(top) == 50
    # docs built from the target vocabulary (i % 3 == 0) should dominate
    # (near-empty docs carry near-zero weight regardless of vocabulary,
    # so dominance, not purity: 100 of 300 raw docs are target-like)
    en_like = sum(1 for r in top if r.doc_id % 3 == 0)
    assert en_like >= 40
    # returned in rank order, ties broken by doc_id
    keys = [(-r.rank_key, r.doc_id) for r in top]
    assert keys == sorted(keys)


def test_select_matches_reference_topk(spark, corpora):
    raw_df, target_df = _dfs(spark, corpora)
    ref = _ref_weights(*corpora, 64, 0.5)
    ranked = sorted(ref.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:20]
    got = dsir_select(raw_df, target_df, 20, n_buckets=64).collect()
    assert [r.doc_id for r in got] == [d for d, _ in ranked]


def test_gumbel_variant_matches_reference(spark, corpora):
    raw_df, target_df = _dfs(spark, corpora)
    ref = _ref_weights(*corpora, 64, 0.5)

    def key(doc_id, w):
        h = int(hashlib.md5(f"s1{doc_id}".encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / float(16**13)
        return round(round(w, 6) - math.log(-math.log(u)), 6)

    ranked = sorted(((key(d, w), d) for d, w in ref.items()), key=lambda t: (-t[0], t[1]))
    got = dsir_select(raw_df, target_df, 25, n_buckets=64, gumbel_seed="s1").collect()
    assert [r.doc_id for r in got] == [d for _, d in ranked[:25]]


def test_zero_feature_docs_omitted(spark):
    raw = spark.createDataFrame([(1, "ab ?? !"), (2, "meaningful words here")],
                                "doc_id long, text string")
    target = spark.createDataFrame([(9, "meaningful words")], "doc_id long, text string")
    got = dsir_log_weights(raw, target, n_buckets=16).collect()
    assert {r.doc_id for r in got} == {2}


def test_invalid_params(spark, corpora):
    raw_df, target_df = _dfs(spark, corpora)
    with pytest.raises(ValueError):
        dsir_log_weights(raw_df, target_df, n_buckets=0)
    with pytest.raises(ValueError):
        dsir_log_weights(raw_df, target_df, smoothing=0.0)
