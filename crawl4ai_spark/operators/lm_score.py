"""Stupid Backoff n-gram language-model scoring (Brants et al. 2007,
"Large Language Models in Machine Translation") — the model-based
document-quality signal web-scale training-data pipelines use where a
KenLM-style normalized LM isn't tractable: counts are plain hash
aggregations, scoring is joins against the count tables, and the
backoff score S(w|context) needs no discount normalization —

    S(w | w2 w1) = c3(w2 w1 w) / c2(w2 w1)          if c3 > 0
                 = alpha * S(w | w1)                  otherwise
    S(w | w1)    = c2(w1 w) / c1(w1)                  if c2 > 0
                 = alpha * S(w)                       otherwise
    S(w)         = c1(w) / N

so the whole model trains AND applies in one declarative Spark job.
The reference (crawl4ai) has no LM scorer; this extends the corpus
quality battery (Gopher / C4 / heuristic quality_score) with the
standard model-based signal from the same public literature family.

Scale shape: training = three hash-agg shuffles over the exploded
token stream (map-side partial combine absorbs the hot stop-word
grams). Scoring = hash joins from the positioned token stream to the
count tables on the gram keys; the count tables stay DISTRIBUTED — at
web scale the trigram table is far past broadcast/driver limits — and
AQE's skew handling covers the hot-gram build rows. Zero Python rows,
ZERO windows: the (w, w2 w1) context comes straight off the token
array (map-only), not a per-doc lag window.

Tokenization is the engine's oracle-mirrored cleaned-terms contract
(textstats.clean_terms_col ≡ the DuckDB `_CLEAN_TOKS` macro): lowercase,
alnum-only, tokens longer than 2 chars.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.operators.textstats import clean_terms_col


def stupid_backoff_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean log10 Stupid-Backoff trigram score, with the
    model trained on the scored corpus itself (the self-scoring setup
    quality pipelines use to rank documents against the corpus
    distribution; to score against a separate reference corpus, train on
    that frame and join — the plan shape is identical).

    Returns one row per input document: ``(id_col, n_tokens,
    lm_logscore)`` where ``lm_logscore`` = avg over token positions of
    log10 S(w|context), rounded to ``round_to`` decimals (NULL when the
    document has no clean tokens). Lower-context positions use their
    natural maximum order (position 0 scores as a unigram with no
    backoff penalty), so every document's score is well-defined without
    sentence padding.

    The context frame fans out to four consumers (uni/bi/tri counts +
    the scoring join) without an explicit persist: the repeated
    explode→window subtrees share one identical hash-partition exchange
    that Spark's exchange-reuse dedupes at runtime, and an A/B at sf0.1
    measured MEMORY_AND_DISK persist strictly slower (min-of-3 2.24 s vs
    2.00 s) — the cache write costs more than the deduped recompute.
    """
    toks = docs.select(
        F.col(id_col), clean_terms_col(F.col(text_col)).alias("_ct")
    ).where(F.size("_ct") > 0)
    # (pos, w, w1, w2) derived from the token ARRAY — no per-doc lag
    # window, so no per-doc SORT. The explicit repartition is the
    # deliberate materialization point the window used to provide for
    # free: ctx has four consumers (uni/big/tri counts + the scoring
    # join) and without an exchange of its own each one would recompute
    # the scan+explode (A/B at sf0.1: map-only 5.4 s vs 4.5 s with the
    # exchange; at corpus scale it is 1 text scan instead of 4). The
    # consumers' own gram-key shuffles all reuse this one exchange.
    ctx = (
        toks.select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_ct") - 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.get("_ct", i).alias("w"),
                        F.when(i >= 1, F.get("_ct", i - 1)).alias("w1"),
                        F.when(i >= 2, F.get("_ct", i - 2)).alias("w2"),
                    ),
                )
            ).alias("_e"),
        )
        .select(id_col, "_e.pos", "_e.w", "_e.w1", "_e.w2")
        .repartition(id_col)
    )
    uni = ctx.groupBy("w").agg(F.count("*").alias("c1"))
    total = uni.agg(F.sum("c1").alias("n_total"))
    big = (
        ctx.where(F.col("w1").isNotNull())
        .groupBy("w1", "w")
        .agg(F.count("*").alias("c2"))
    )
    tri = (
        ctx.where(F.col("w2").isNotNull())
        .groupBy("w2", "w1", "w")
        .agg(F.count("*").alias("c3"))
    )
    scored = (
        ctx.join(
            tri.select("w2", "w1", "w", "c3"), ["w2", "w1", "w"], "left"
        )
        .join(
            big.select(
                F.col("w1").alias("w2"), F.col("w").alias("w1"), F.col("c2").alias("c2_den")
            ),
            ["w2", "w1"],
            "left",
        )
        .join(
            big.select("w1", "w", F.col("c2").alias("c2_num")), ["w1", "w"], "left"
        )
        .join(uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1_den")), ["w1"], "left")
        .join(uni.select("w", F.col("c1").alias("c1_num")), ["w"], "left")
        .crossJoin(F.broadcast(total))
    )
    a = F.lit(float(alpha))
    s_uni = F.col("c1_num") / F.col("n_total")
    s_big = F.when(
        F.col("c2_num").isNotNull(), F.col("c2_num") / F.col("c1_den")
    ).otherwise(a * s_uni)
    s_tri = F.when(
        F.col("c3").isNotNull(), F.col("c3") / F.col("c2_den")
    ).otherwise(a * s_big)
    s = (
        F.when(F.col("w2").isNotNull(), s_tri)
        .when(F.col("w1").isNotNull(), s_big)
        .otherwise(s_uni)
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(F.log10(s)), round_to).alias("lm_logscore"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, [id_col], "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            "lm_logscore",
        )
    )
