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

Scale shape — score TYPES, not tokens: the backoff score is a function
of the trigram TYPE alone, and a corpus has far fewer trigram types
than token positions (10× on the benchmark corpus; always ≤). So the
token stream is shuffled exactly TWICE on stream-sized frames — once
into the (w2,w1,w) type-count aggregation (map-side combine absorbs
hot stop-word grams) and once per document for the final mean — while
the five count-table joins of the backoff ladder run over the small
type frame only. The type aggregation and the stream's scoring join
hash on the SAME (w2,w1,w) key (missing context holds a sentinel, so
the key is never NULL and one exchange serves both sides via Spark's
exchange reuse). The count tables stay DISTRIBUTED — at web scale the
trigram table is far past broadcast/driver limits — and AQE's skew
handling covers the hot-gram rows. Zero Python rows, ZERO windows: the
(w, w1, w2) context comes straight off the token array (map-only), not
a per-doc lag window. (The previous formulation joined the full token
stream against every count table — five stream-sized shuffles; at
sf0.1 the wall is the same 3.4 s — scan+clean+explode dominate there —
but the exchange count on stream-sized frames drops 7 → 3, which is
the term that grows with corpus size.)

Tokenization is the engine's oracle-mirrored cleaned-terms contract
(textstats.clean_terms_col ≡ the DuckDB `_CLEAN_TOKS` macro): lowercase,
alnum-only, tokens longer than 2 chars.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.operators.textstats import clean_terms_col

# impossible clean token (clean terms are [a-z0-9]{3,}): marks "no
# context at this order" so gram keys are never NULL (NULL join keys
# never match; a sentinel keeps the type join one plain equi-join)
_NOCTX = "\x00"


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
    """
    toks = docs.select(
        F.col(id_col), clean_terms_col(F.col(text_col)).alias("_ct")
    ).where(F.size("_ct") > 0)
    # (w, w1, w2) context derived from the token ARRAY — no per-doc lag
    # window, so no per-doc SORT; absent context carries the sentinel
    ctx = (
        toks.select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_ct") - 1),
                    lambda i: F.struct(
                        F.get("_ct", i).alias("w"),
                        F.coalesce(
                            F.when(i >= 1, F.get("_ct", i - 1)), F.lit(_NOCTX)
                        ).alias("w1"),
                        F.coalesce(
                            F.when(i >= 2, F.get("_ct", i - 2)), F.lit(_NOCTX)
                        ).alias("w2"),
                    ),
                )
            ).alias("_e"),
        )
        .select(id_col, "_e.w", "_e.w1", "_e.w2")
    )
    has_w1 = F.col("w1") != _NOCTX
    has_w2 = F.col("w2") != _NOCTX
    # ONE stream-sized aggregation builds the type table; every n-gram
    # count table folds off it (tiny follow-up shuffles)
    typ = ctx.groupBy("w2", "w1", "w").agg(F.count("*").alias("ct"))
    uni = typ.groupBy("w").agg(F.sum("ct").alias("c1"))
    total = uni.agg(F.sum("c1").alias("n_total"))
    big = typ.where(has_w1).groupBy("w1", "w").agg(F.sum("ct").alias("c2"))
    # backoff ladder over the TYPE frame (types << tokens)
    st = (
        typ.join(
            big.select(
                F.col("w1").alias("w2"),
                F.col("w").alias("w1"),
                F.col("c2").alias("c2_den"),
            ),
            ["w2", "w1"],
            "left",
        )
        .join(big.select("w1", "w", F.col("c2").alias("c2_num")), ["w1", "w"], "left")
        .join(
            uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1_den")),
            ["w1"],
            "left",
        )
        .join(uni.select("w", F.col("c1").alias("c1_num")), ["w"], "left")
        .crossJoin(F.broadcast(total))
    )
    a = F.lit(float(alpha))
    c3 = F.when(has_w2, F.col("ct"))
    s_uni = F.col("c1_num") / F.col("n_total")
    s_big = F.when(
        F.col("c2_num").isNotNull(), F.col("c2_num") / F.col("c1_den")
    ).otherwise(a * s_uni)
    s_tri = F.when(c3.isNotNull(), c3 / F.col("c2_den")).otherwise(a * s_big)
    s = F.when(has_w2, s_tri).when(has_w1, s_big).otherwise(s_uni)
    scored_types = st.select("w2", "w1", "w", F.log10(s).alias("_ls"))
    # the stream's ONLY other shuffle pair: type join (hash on the same
    # (w2,w1,w) key as typ — exchange reused) + the per-doc mean
    per_doc = (
        ctx.join(scored_types, ["w2", "w1", "w"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("_ls"), round_to).alias("lm_logscore"),
        )
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
