"""Corpus text analysis — tokenization, quality, language-ID, fingerprints.

The relational layer of the reference's adaptive crawler and seeder
(``crawl4ai/adaptive_crawler.py:548-607`` tf/df maps and tokenization,
``crawl4ai/async_url_seeder.py:752-784`` BM25 scoring,
``crawl4ai/content_filter_strategy.py`` quality heuristics) re-expressed
as **native Spark column expressions** — no Python in any of the hot
paths, so everything stays inside WholeStageCodegen and pushes down to
the parquet scan.

These are the building blocks a 100 TB training-data pipeline needs over
a ``documents(doc_id, text, ...)`` table: token counting, quality
scoring, language-ID heuristics, term frequencies and document
fingerprinting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

# Tokenization contract (mirrored 1:1 in the DuckDB oracle SQL):
# split on whitespace runs after trimming.
TOKEN_SPLIT_RE = r"\s+"

# Reference-style token cleaning (adaptive_crawler.py:598-607): lowercase,
# strip non-alphanumerics, keep tokens longer than 2 chars.
WORD_CHARS_RE = r"[^a-z0-9 ]"

PUNCT_CLASS = r"[^.,!?;:]"

# Tiny per-language stopword panels for the n-gram/stopword language-ID
# heuristic. Deliberately small + public-common words.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "pour", "dans", "que", "une", "des"),
    "es": ("el", "la", "los", "de", "que", "en", "por", "con", "una", "para"),
}


def tokens_col(text_col: Column) -> Column:
    """Whitespace tokenization (the oracle-mirrored contract)."""
    return F.split(F.trim(text_col), TOKEN_SPLIT_RE)


def token_count_col(text_col: Column) -> Column:
    return F.when(F.length(F.trim(text_col)) == 0, F.lit(0)).otherwise(
        F.size(tokens_col(text_col))
    )


# GPT-2-style pre-tokenizer pattern (public: the BPE pre-split regex of
# Radford et al. 2019), minus the trailing-space lookahead — RE2-class
# engines (DuckDB's oracle side) have no lookahead, and both Java regex
# and RE2 evaluate this alternation leftmost-first, so engine and oracle
# count identically. Groups: contractions, space+letters, space+digits,
# space+other, whitespace runs.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_col(text_col: Column) -> Column:
    """Sub-word-ish token count via the GPT-2 pre-tokenizer regex —
    the 'BPE-ish' budget estimate for LLM training pipelines (a real BPE
    merge table refines these pieces but never crosses their borders, so
    the count upper-bounds real BPE length piece-wise)."""
    return F.regexp_count(text_col, F.lit(BPE_SPLIT_RE))


def clean_terms_col(text_col: Column) -> Column:
    """Reference-style cleaned terms: lowercase, alnum-only, len > 2."""
    cleaned = F.regexp_replace(F.lower(text_col), WORD_CHARS_RE, "")
    toks = F.split(F.trim(cleaned), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: F.length(t) > 2)


def punct_count_col(text_col: Column) -> Column:
    return F.length(F.regexp_replace(text_col, PUNCT_CLASS, ""))


def quality_score_col(text_col: Column) -> Column:
    """Composite document-quality heuristic in pure column algebra.

    score = 0.4·len_score + 0.3·(1 − punct_ratio·10 capped) + 0.3·word_len
    with len_score = min(n_tokens/100, 1), word_len score peaking around
    mean word length 5. Rounded to 6 decimals for engine-portable
    comparison.
    """
    n_tok = token_count_col(text_col).cast("double")
    n_chars = F.length(text_col).cast("double")
    punct_ratio = F.when(n_chars > 0, punct_count_col(text_col) / n_chars).otherwise(F.lit(0.0))
    mean_word = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 10.0)
    word_score = F.greatest(F.lit(0.0), F.lit(1.0) - F.abs(mean_word - F.lit(5.0)) / F.lit(5.0))
    return F.round(len_score * 0.4 + punct_score * 0.3 + word_score * 0.3, 6)


def langid_scores(text_col: Column) -> Column:
    """Stopword-panel language-ID: map<lang, overlap_count> (heuristic)."""
    toks = F.split(F.lower(F.trim(text_col)), TOKEN_SPLIT_RE)
    pairs = [
        F.struct(
            F.lit(lang).alias("lang"),
            F.size(F.array_intersect(toks, F.lit(list(words)))).alias("hits"),
        )
        for lang, words in LANG_STOPWORDS.items()
    ]
    return F.array(*pairs)


def langid_best(text_col: Column) -> Column:
    """argmax language of the stopword panel (ties → lexicographic)."""
    scores = langid_scores(text_col)
    best = F.array_max(
        F.transform(scores, lambda s: F.struct(s["hits"].alias("hits"), s["lang"].alias("lang")))
    )
    # array_max on struct orders by first field asc; ties resolved by the
    # SECOND field max — we want lexicographic min on tie, so invert via
    # sort: take max hits, then min lang among those with max hits.
    max_hits = F.array_max(F.transform(scores, lambda s: s["hits"]))
    winners = F.filter(scores, lambda s: s["hits"] == max_hits)
    return F.array_min(F.transform(winners, lambda s: s["lang"]))


def term_frequencies(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus tf/df table: (term, tf, df) — the adaptive crawler's
    frequency maps as one hash aggregation (map-side partial agg free)."""
    terms = docs.select(
        F.col(id_col), F.explode(clean_terms_col(F.col(text_col))).alias("term")
    )
    return terms.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.countDistinct(id_col).alias("df"),
    )


@pandas_udf(LongType())
def udf_simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over cleaned tokens (numpy bit-vote, Arrow-batched).

    Deterministic across runs AND engines: token hash = first 8 bytes of
    md5(token utf-8), big-endian — the one 64-bit hash expressible in
    both Spark and DuckDB SQL (``('0x' || substr(md5(w), 1, 16))::
    UBIGINT``), which is what lets ``simhash_candidates`` carry a full
    cross-engine equality oracle instead of a rows-only check.
    """
    import hashlib
    import re as _re

    out = np.zeros(len(text), dtype=np.int64)
    splitter = _re.compile(TOKEN_SPLIT_RE)
    cleaner = _re.compile(WORD_CHARS_RE)
    for i, t in enumerate(text):
        if not t:
            continue
        toks = [w for w in splitter.split(cleaner.sub("", t.lower()).strip()) if len(w) > 2]
        if not toks:
            continue
        hashes = np.fromiter(
            (
                int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                for w in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sim.astype(np.int64))
    return pd.Series(out)


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS local fingerprinting algorithm): hash every word k-gram,
    slide a window of ``window`` consecutive hashes, keep each window's
    minimum; the distinct kept hashes are the document's fingerprint set.

    Guarantee: any shared token run of at least ``window + k - 1`` words
    between two documents contributes at least one shared fingerprint —
    the rolling-hash fingerprint family (C4 span dedup's keeper join uses
    exact spans; winnowing gives the position-robust subset).

    Returns (doc_id, fingerprint string) — one row per distinct kept
    hash. The gram hash is md5 hex (engine-portable: the DuckDB oracle
    reproduces it exactly; winnowing only needs a total order on hashes).

    Scale shape: the shared positioned-k-gram pipeline
    (``dedup.kgram_rows``: repartition-before-explode, lead-window gram
    build), then partition-local window minima and a distinct hash agg.
    """
    from pyspark.sql import Window as W

    from crawl4ai_spark.operators.dedup import kgram_rows

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    hashed = kgram_rows(docs, id_col, text_col, k).select(
        "doc_id", "pos", F.md5("gram").alias("h")
    )
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    kept = hashed.select(
        "doc_id",
        F.min("h").over(win).alias("fingerprint"),
        # windows shorter than `window` at the tail are not full windows
        F.count("h").over(win).alias("_n"),
    ).where(F.col("_n") == window)
    return kept.select("doc_id", "fingerprint").distinct()
