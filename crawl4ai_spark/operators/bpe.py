"""Byte-pair-encoding tokenizer — distributed fitting and corpus encoding.

The tokenizer-fitting step of an LLM training-data pipeline (Sennrich et
al. 2016 "Neural Machine Translation of Rare Words with Subword Units";
pre-tokenization follows the GPT-2 regex of Radford et al. 2019, already
the oracle-mirrored contract in ``operators/textstats.py``). The
reference repo counts tokens for budgeting but never fits a vocabulary;
a 100 TB curation pipeline does, so this closes that step Spark-first.

Scale design (what survives 100 TB):

- **The only corpus-sized pass is a hash aggregation.** Pre-tokens come
  from one ``regexp_extract_all`` + ``explode`` and collapse to a
  ``(word, count)`` table via map-side-combining hash aggs. By Heaps'
  law the distinct pre-token table is millions of rows where the corpus
  is trillions — it, not the corpus, is what training touches.
- **Merge learning is inherently sequential** (merge *i* depends on the
  table rewritten by merge *i-1*), so no engine distributes the loop
  itself; like every production trainer we fit on the dominant-mass head
  of the word-count table, capped deterministically (count desc, word
  asc) at ``max_words`` and pulled to the driver — the same
  bounded-deterministic-sample posture as the IVF k-means quantizer
  (``operators/similarity.py``).
- **Encoding pays Python per *distinct word*, never per row.** The
  corpus explodes to ``(doc_id, word)``, but the Arrow-batched encode
  UDF runs on the deduplicated word frame only; piece counts broadcast
  back and the corpus re-aggregates JVM-side. A 100 TB corpus with a
  10⁷-word vocabulary does 10⁷ Python encodes, not 10¹² — and each is
  memoized within a batch.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.operators.textstats import BPE_SPLIT_RE


def pretokenize_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → ``(word, count)`` via the GPT-2 pre-tokenizer regex.

    One explode + one hash aggregation (map-side partials make the
    shuffle carry distinct words per partition, not token occurrences).
    Whitespace-run pieces are kept: they are tokens under the GPT-2
    contract and their statistics matter for packing budgets.
    """
    words = df.select(
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), F.lit(0))).alias(
            "word"
        )
    )
    return words.groupBy("word").agg(F.count("*").alias("count"))


def bpe_train_merges(
    word_counts: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a ``(word, count)`` table.

    Deterministic: each round merges the most frequent adjacent symbol
    pair, ties broken by the lexicographically smallest pair — so the
    learned table is a pure function of the word counts, which is what
    lets the DuckDB oracle pin the distributed path with exported
    literals (the centroid-literal pattern of ``semantic_dedup``).

    Incremental pair-count maintenance: only words containing the merged
    pair are rewritten each round, and pair counts are adjusted by the
    delta of those rewrites — O(Σ|word| · touched) rather than a full
    recount per merge. tests/test_bpe.py pins equality against a naive
    recount-from-scratch reference implementation.
    """
    # symbol sequences + pair -> count, pair -> {word_idx}
    seqs: list[list[str]] = []
    counts: list[int] = []
    for w, c in word_counts:
        if len(w) >= 2:  # single-symbol words never contribute a pair
            seqs.append(list(w))
            counts.append(int(c))
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, seq in enumerate(seqs):
        c = counts[i]
        for a, b in zip(seq, seq[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best: tuple[str, str] | None = None
        best_n = 0
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n <= 0:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            seq, c = seqs[i], counts[i]
            # remove this word's pair contributions, rewrite, re-add
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                s = pair_words.get((a, b))
                if s is not None:
                    s.discard(i)
                    if not s:
                        del pair_words[(a, b)]
            new: list[str] = []
            j = 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == best[0] and seq[j + 1] == best[1]:
                    new.append(merged)
                    j += 2
                else:
                    new.append(seq[j])
                    j += 1
            seqs[i] = new
            for a, b in zip(new, new[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(i)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one pre-token under a learned merge table (GPT-2 style:
    repeatedly apply the lowest-rank applicable merge). Pieces always
    concatenate back to the word — the roundtrip invariant."""
    seq = list(word)
    while len(seq) >= 2:
        best_rank = None
        best_j = -1
        for j, p in enumerate(zip(seq, seq[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        seq[best_j : best_j + 2] = [seq[best_j] + seq[best_j + 1]]
    return seq


def bpe_train(
    df: DataFrame,
    n_merges: int,
    max_words: int = 100_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge learning.

    The collect is bounded by ``max_words`` (deterministic head of the
    count-desc, word-asc order), mirroring the bounded k-means sample —
    never the corpus."""
    wc = pretokenize_words(df, text_col)
    head = wc.orderBy(F.desc("count"), F.asc("word")).limit(max_words).collect()
    return bpe_train_merges([(r["word"], r["count"]) for r in head], n_merges)


def encode_words_df(words: DataFrame, merges: Sequence[tuple[str, str]]) -> DataFrame:
    """Distinct-word frame → ``(word, n_pieces, pieces)`` via one
    Arrow-batched UDF. This is the ONLY Python in the tokenize path and
    it runs on the deduplicated vocabulary, not the corpus."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    schema = "word string, n_pieces int, pieces array<string>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            pieces = []
            for w in pdf["word"]:
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, ranks)
                pieces.append(got)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_pieces": [len(p) for p in pieces],
                    "pieces": pieces,
                }
            )

    return words.select("word").mapInPandas(run, schema)


def bpe_tokenize_stats(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token statistics under a learned BPE vocabulary:
    ``(doc_id, n_words, n_pieces)``.

    Plan shape: corpus explode → distinct-word frame (hash agg) →
    Arrow encode on the vocabulary only → **broadcast** piece counts
    back onto the exploded corpus → per-doc hash agg. The corpus is
    shuffled once (by ``doc_id`` for the final agg — and the explode
    preserves the scan's doc_id clustering, so AQE usually elides even
    that); the vocabulary frame is what moves to Python.
    """
    exploded = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), F.lit(0))).alias(
            "word"
        ),
    )
    vocab = encode_words_df(exploded.select("word").distinct(), merges).select(
        "word", "n_pieces"
    )
    joined = exploded.join(F.broadcast(vocab), "word")
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.sum("n_pieces").cast("long").alias("n_pieces"),
    )
    # empty/whitespace-only-missing docs: left join back for total coverage
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_pieces", F.lit(0)).cast("long").alias("n_pieces"),
        )
    )
