"""BPE trainer/encoder vs a naive clean-room reference + Spark-path parity.

Reference implementations here are deliberately DIFFERENT algorithms with
the same published semantics (Sennrich et al. 2016):

- trainer: full pair recount from scratch every round (no incremental
  bookkeeping) — pins the operator's delta-maintenance logic;
- encoder: apply merges sequentially in learned order (the original
  paper's procedure) — pins the operator's GPT-2-style min-rank loop
  (the two are equivalent on any fixed merge table).
"""

from __future__ import annotations

import random
import re

import pytest

from crawl4ai_spark.operators.bpe import (
    bpe_train,
    bpe_train_merges,
    bpe_tokenize_stats,
    encode_word,
)
from crawl4ai_spark.operators.textstats import BPE_SPLIT_RE

# ---------------------------------------------------------------- references


def naive_train(word_counts, n_merges):
    seqs = {w: tuple(w) for w, _ in word_counts}
    counts = dict(word_counts)
    merges = []
    for _ in range(n_merges):
        pc = {}
        for w, seq in seqs.items():
            for p in zip(seq, seq[1:]):
                pc[p] = pc.get(p, 0) + counts[w]
        if not pc:
            break
        best_n = max(pc.values())
        best = min(p for p, n in pc.items() if n == best_n)
        merges.append(best)
        out = {}
        for w, seq in seqs.items():
            new, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and (seq[j], seq[j + 1]) == best:
                    new.append(seq[j] + seq[j + 1])
                    j += 2
                else:
                    new.append(seq[j])
                    j += 1
            out[w] = tuple(new)
        seqs = out
    return merges


def naive_encode(word, merges):
    seq = list(word)
    for a, b in merges:
        new, j = [], 0
        while j < len(seq):
            if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                new.append(a + b)
                j += 2
            else:
                new.append(seq[j])
                j += 1
        seq = new
    return seq


def rand_word_counts(seed, n_words=120, alpha="abcde"):
    rng = random.Random(seed)
    out = {}
    for _ in range(n_words):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
        out[w] = out.get(w, 0) + rng.randint(1, 50)
    return sorted(out.items())


# ------------------------------------------------------------------ training


@pytest.mark.parametrize("seed", range(6))
def test_trainer_equals_naive_recount(seed):
    wc = rand_word_counts(seed)
    assert bpe_train_merges(wc, 40) == naive_train(wc, 40)


def test_trainer_exhausts_gracefully():
    # tiny corpus: fewer possible merges than requested
    wc = [("aa", 5), ("ab", 3)]
    m = bpe_train_merges(wc, 100)
    assert m == naive_train(wc, 100)
    assert 0 < len(m) < 100


def test_trainer_tiebreak_lexicographic():
    # "ba" and "ab" both appear 3 times -> "ab" must win round 1
    wc = [("ab", 3), ("ba", 3)]
    assert bpe_train_merges(wc, 1) == [("a", "b")]


# ------------------------------------------------------------------ encoding


@pytest.mark.parametrize("seed", range(4))
def test_encode_minrank_equals_sequential(seed):
    wc = rand_word_counts(seed)
    merges = bpe_train_merges(wc, 60)
    ranks = {p: i for i, p in enumerate(merges)}
    rng = random.Random(seed + 99)
    words = [w for w, _ in wc] + [
        "".join(rng.choice("abcdefz") for _ in range(rng.randint(1, 14))) for _ in range(200)
    ]
    for w in words:
        got = encode_word(w, ranks)
        assert got == naive_encode(w, merges), w
        assert "".join(got) == w  # roundtrip invariant


def test_encode_unknown_symbols_pass_through():
    merges = [("a", "b")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("日本ab語", ranks) == ["日", "本", "ab", "語"]
    assert encode_word("", ranks) == []


# ---------------------------------------------------------------- spark path


SF = "/root/testdata/sf0.001"


def test_bpe_tokenize_stats_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    merges = bpe_train(docs, n_merges=64, max_words=5000)
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in bpe_tokenize_stats(docs, merges).collect()
    }

    ranks = {p: i for i, p in enumerate(merges)}
    pat = re.compile(BPE_SPLIT_RE.replace(r"\p{L}", r"[^\W\d_]").replace(r"\p{N}", r"\d"))
    memo = {}
    for r in docs.collect():
        words = pat.findall(r["text"] or "")
        n_pieces = 0
        for w in words:
            if w not in memo:
                memo[w] = len(encode_word(w, ranks))
            n_pieces += memo[w]
        assert got[r["doc_id"]] == (len(words), n_pieces), r["doc_id"]
    assert len(got) == docs.count()


def test_bpe_train_deterministic_across_runs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    m1 = bpe_train(docs, n_merges=32, max_words=2000)
    m2 = bpe_train(docs.repartition(7), n_merges=32, max_words=2000)
    assert m1 == m2 and len(m1) == 32
