"""Corpus-level BM25 + adaptive-crawl progress aggregates.

Semantic contract: the reference's adaptive crawler statistics
(``crawl4ai/adaptive_crawler.py``): coverage (:328-367 — per query term
(df/N)·(1 + 0.5·log(1+tf)/log(1+max_tf)), averaged, √-curve capped at 1),
consistency (:369-394 — mean pairwise Jaccard of document term sets),
saturation (:396-411 — 1 − new_terms ratio), confidence combine
(:309-326 — 0.4·coverage + 0.3·consistency + 0.3·saturation), and the
seeder's BM25 relevance scoring (``async_url_seeder.py:752-784``).

Everything is hash-aggregation + join column algebra — the reference's
in-memory tf/df dicts ARE a groupBy, so this layer is where Spark is
strictly better: partial aggregation, no driver state.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.operators.textstats import clean_terms_col


def doc_terms(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term) distinct pairs + per-doc length table."""
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(clean_terms_col(F.col(text_col))).alias("term")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 score of every document against a bag of query terms.

    idf = ln(1 + (N − df + 0.5)/(df + 0.5)); tf normalized by doc length.
    Two shuffles total (term agg + per-doc sum), query terms broadcast.
    """
    spark = docs.sparkSession
    terms = doc_terms(docs, id_col, text_col)
    doc_len = terms.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_docs = docs.count()
    avg_dl = doc_len.agg(F.avg("dl")).head()[0] or 1.0

    qt = spark.createDataFrame([(t.lower(),) for t in query_terms], "term string")
    tf = (
        terms.join(F.broadcast(qt), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .join(doc_len, "doc_id")
        .withColumn(
            "term_score",
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(float(avg_dl)))),
        )
    )
    return scored.groupBy("doc_id").agg(F.round(F.sum("term_score"), 6).alias("bm25"))


def coverage_stats(
    docs: DataFrame, query_terms: list[str], id_col: str = "doc_id", text_col: str = "text"
) -> float:
    """Adaptive-crawler coverage: per query term
    (df/N)·(1 + 0.5·ln(1+tf)/ln(1+max_tf)), averaged over terms,
    √-curve capped at 1.0."""
    spark = docs.sparkSession
    terms = doc_terms(docs, id_col, text_col)
    n_docs = docs.count()
    if n_docs == 0 or not query_terms:
        return 0.0
    qt = spark.createDataFrame([(t.lower(),) for t in query_terms], "term string")
    stats = (
        terms.join(F.broadcast(qt), "term")
        .groupBy("term")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
        .collect()
    )
    by_term = {r.term: (r.tf, r.df) for r in stats}
    max_tf = max((tf for tf, _ in by_term.values()), default=0)
    total = 0.0
    for term in {t.lower() for t in query_terms}:
        tf, df = by_term.get(term, (0, 0))
        if df == 0:
            continue
        boost = 1.0 + (0.5 * math.log(1 + tf) / math.log(1 + max_tf) if max_tf > 0 else 0.0)
        total += (df / n_docs) * boost
    avg = total / len({t.lower() for t in query_terms})
    return min(math.sqrt(avg), 1.0)


def consistency_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = 256,
    n_hashes: int = 64,
    seed: int = 42,
) -> float:
    """Mean pairwise term-set Jaccard, estimated deterministically.

    The reference computes the exact mean over ALL doc pairs in the
    driver (O(n²), adaptive_crawler.py:369-394) — intractable at corpus
    scale, and a relational port with ``limit()``-capped pairs is
    run-dependent. This estimator is reproducible and bounded:

    1. seeded hash-ordered sample of ≤ ``max_docs`` documents
       (``xxhash64(doc_id, seed)`` order — same set every run),
    2. MinHash signatures over term sets (n=1 shingles, shared
       ``dedup.minhash_signatures`` pipeline — no term self-join),
    3. mean signature-agreement Jaccard estimate over all sample pairs
       (≤ max_docs² rows through a broadcast join of two tiny frames).

    Per-pair error ~ 1/sqrt(n_hashes), averaged over ~max_docs²/2 pairs.
    """
    from crawl4ai_spark.operators.dedup import minhash_signatures

    sample = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .withColumn("_h", F.xxhash64(F.col("doc_id").cast("string"), F.lit(seed)))
        .orderBy("_h", "doc_id")
        .limit(max_docs)
        .drop("_h")
        # minhash_signatures requires int64 ids; the pairwise mean only
        # needs distinctness + a total order, so any id type (URLs
        # included) maps through a stable 64-bit hash
        .withColumn("doc_id", F.xxhash64(F.col("doc_id").cast("string")))
    )
    sigs = minhash_signatures(sample, "doc_id", "text", n=1, k=n_hashes, seed=seed)
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("signature").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("signature").alias("sig_b"))
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    row = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select((agree / F.lit(float(n_hashes))).alias("j"))
        .agg(F.avg("j").alias("avg_j"))
        .head()
    )
    return float(row.avg_j) if row.avg_j is not None else 1.0


def saturation_stat(new_terms_by_wave: list[int]) -> float:
    """1 − recent_new_terms / initial_new_terms (driver-side scalar over
    the per-wave metrics table), exactly the reference's edge semantics
    (``adaptive_crawler.py:396-411``): fewer than two history entries →
    0.0, and a zero rate on either end is clamped to 1 before the ratio
    (so recent=0 yields 1 − 1/initial, not a hard 1.0)."""
    if len(new_terms_by_wave) < 2:
        return 0.0
    recent = new_terms_by_wave[-1] if new_terms_by_wave[-1] > 0 else 1
    initial = new_terms_by_wave[0] if new_terms_by_wave[0] > 0 else 1
    return max(0.0, min(1.0 - recent / initial, 1.0))


def confidence(coverage: float, consistency: float, saturation: float) -> float:
    """0.4·coverage + 0.3·consistency + 0.3·saturation."""
    return 0.4 * coverage + 0.3 * consistency + 0.3 * saturation


def rank_links_expected_gain(
    candidate_docs: DataFrame,
    seen_terms: DataFrame,
    query_terms: list[str],
    relevance_weight: float = 0.7,
    novelty_weight: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adaptive-crawler link ranking (``adaptive_crawler.py:413-496``):
    expected gain = relevance·w_r + novelty·w_n, where relevance is the
    query-term overlap fraction and novelty is the fraction of the
    candidate's terms NOT yet in the crawled corpus (``seen_terms(term)``).

    Relational shape: one distinct-terms explode, one broadcast query
    join, one anti-join against seen terms — all hash operations.
    """
    spark = candidate_docs.sparkSession
    terms = doc_terms(candidate_docs, id_col, text_col).distinct()
    sizes = terms.groupBy("doc_id").agg(F.count("*").alias("n_terms"))
    qt = spark.createDataFrame([(t.lower(),) for t in set(query_terms)], "term string")
    rel = (
        terms.join(F.broadcast(qt), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    new_terms = (
        terms.join(seen_terms.select("term").distinct(), "term", "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_new"))
    )
    n_query = max(len(set(query_terms)), 1)
    return (
        sizes.join(rel, "doc_id", "left")
        .join(new_terms, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(n_query)) * relevance_weight
                + F.coalesce(F.col("n_new"), F.lit(0)) / F.col("n_terms") * novelty_weight,
                6,
            ).alias("expected_gain"),
        )
        .orderBy(F.desc("expected_gain"), F.asc("doc_id"))
    )
