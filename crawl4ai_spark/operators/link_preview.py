"""Link preview — head-data contextual scoring for discovered links.

Port of the reference's link-preview flow (``crawl4ai/link_preview.py``
:190-331 + ``async_url_seeder.py:534-552,1466-1748``): for each link,
"fetch" the target's head content, score it against the crawl query with
Okapi BM25 across the whole link batch, min-max normalize to [0, 1], and
blend into ``total_score`` (0.7·intrinsic + 0.3·contextual×10,
``utils.py:3459-3504``).

Spark-first re-expression: the reference HEAD-probes every link over the
network with a bounded-concurrency seeder; here the "fetch" is a join of
the link batch against the pages table, head extraction is an Arrow UDF
pass, and the BM25 corpus statistics (df over the full vocabulary, avg
document length, the rank_bm25 ε-floor over the average IDF) are computed
relationally — three hash aggregations plus one-row broadcast cross
joins, no driver-side loop. Scales to a 10^8-link batch: the only
shuffles are groupBy(term) for df, groupBy(id) for length/tf, and the
pages join.

Links whose target has no page row or an empty head (the reference falls
back to a URL-string heuristic there, ``async_url_seeder.py:1519``) get
``contextual_score`` NULL — the total-score ladder then falls back to
intrinsic-only, exactly the models.py Link semantics for an unscored
link (documented deviation: no URL-string fallback score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.extraction.udfs import udf_head_meta

K1 = 1.5
B = 0.75
EPSILON = 0.25


def head_text_context(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, head_text, head_data) — the text-context extraction of
    ``async_url_seeder.py:1466-1517`` (title + meta description/keywords/
    author joined) as one Arrow UDF pass over the pages table.
    ``head_data`` is the Link model's per-target head map
    (models.py:373-383)."""
    head = udf_head_meta(F.col(html_col))
    df = pages.select(F.col(url_col).alias("url"), head.alias("_h"))
    blank = lambda f: F.coalesce(F.col(f"_h.{f}"), F.lit(""))  # noqa: E731
    return df.select(
        "url",
        F.trim(
            F.concat_ws(
                " ", blank("title"), blank("description"), blank("keywords"), blank("author")
            )
        ).alias("head_text"),
        F.create_map(
            F.lit("title"), blank("title"),
            F.lit("description"), blank("description"),
            F.lit("keywords"), blank("keywords"),
            F.lit("author"), blank("author"),
        ).alias("head_data"),
    )


def okapi_bm25(
    docs: DataFrame,
    query: str,
    id_col: str = "id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    epsilon: float = EPSILON,
) -> DataFrame:
    """Raw Okapi BM25 of ``query`` against every doc — the exact
    ``rank_bm25.BM25Okapi`` semantics the reference calls
    (``async_url_seeder.py:1703-1748``): whitespace-lowercase tokens, IDF
    ln(n−df+0.5)−ln(df+0.5) with negative values floored at ε·avg-idf
    (average over the FULL vocabulary), score per query term
    idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)). Returns (id, bm25_raw);
    docs containing no query term — including zero-token docs — score 0,
    and zero-token docs count toward corpus_size/avgdl exactly as
    ``BM25Okapi`` counts them (``len(corpus)`` / ``doc_len`` include
    empty token lists).

    All-relational: two groupBy shuffles (term df, doc length/tf) and
    one-row broadcast cross joins for the corpus constants.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"), lambda x: x != "")
        ).alias("term"),
    )
    ids = docs.select(F.col(id_col).alias("id"))
    dl = ids.join(toks.groupBy("id").agg(F.count("*").alias("dl")), "id", "left").select(
        "id", F.coalesce(F.col("dl"), F.lit(0)).alias("dl")
    )
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )  # n = ALL docs (rank_bm25 counts empty token lists in the corpus)
    dft = toks.groupBy("term").agg(F.count_distinct("id").alias("df"))
    idf_raw = dft.crossJoin(F.broadcast(stats)).select(
        "term",
        (F.log(F.col("n") - F.col("df") + 0.5) - F.log(F.col("df") + 0.5)).alias("raw"),
    )
    avg_idf = idf_raw.agg(F.avg("raw").alias("avg_idf"))
    idf = idf_raw.crossJoin(F.broadcast(avg_idf)).select(
        "term",
        F.when(F.col("raw") < 0, epsilon * F.col("avg_idf")).otherwise(F.col("raw")).alias("idf"),
    )
    # rank_bm25 iterates the query WITH multiplicity — "alpha alpha beta"
    # adds alpha's term score twice — so weight each distinct term by its
    # query count instead of deduplicating it away
    from collections import Counter

    q_mult = Counter(t for t in query.lower().split() if t)
    q_terms = list(q_mult)
    q_weight = F.create_map(
        *[F.lit(x) for t, c in q_mult.items() for x in (t, float(c))]
    )
    tf = (
        toks.where(F.col("term").isin(q_terms))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    per_term = (
        tf.join(idf, "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            (
                F.element_at(q_weight, F.col("term"))
                * F.col("idf")
                * F.col("tf")
                * (k1 + 1)
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
    )
    scores = per_term.groupBy("id").agg(F.sum("s").alias("bm25_raw"))
    return (
        dl.select("id")
        .join(scores, "id", "left")
        .select("id", F.coalesce(F.col("bm25_raw"), F.lit(0.0)).alias("bm25_raw"))
    )


def link_preview_scores(
    links: DataFrame,
    pages: DataFrame,
    query: str,
    href_col: str = "href",
    intrinsic_col: str | None = None,
    url_col: str = "url",
    html_col: str = "html",
    include_head_data: bool = False,
) -> DataFrame:
    """Score a link batch against ``query`` via the targets' head data.

    Returns ``links`` + ``contextual_score`` (min-max-normalized BM25 over
    the scored batch, 0.5 everywhere when all raw scores tie — the
    reference's normalization, ``async_url_seeder.py:1730-1744``) +
    ``total_score`` (the 0.7/0.3 blend; intrinsic-only fallback when the
    target has no head data). ``include_head_data`` additionally attaches
    the Link model's ``head_data`` map (models.py:379).
    """
    heads = head_text_context(pages, url_col, html_col).where(F.col("head_text") != "")
    corpus = (
        links.select(F.col(href_col).alias("id"))
        .distinct()
        .join(heads.withColumnRenamed("url", "id"), "id")
    )
    raw = okapi_bm25(corpus.select("id", "head_text"), query, id_col="id", text_col="head_text")
    mm = raw.agg(F.min("bm25_raw").alias("lo"), F.max("bm25_raw").alias("hi"))
    ctx = raw.crossJoin(F.broadcast(mm)).select(
        F.col("id").alias(href_col),
        F.when(F.col("hi") == F.col("lo"), F.lit(0.5))
        .otherwise((F.col("bm25_raw") - F.col("lo")) / (F.col("hi") - F.col("lo")))
        .alias("contextual_score"),
    )
    if include_head_data:
        ctx = ctx.join(
            corpus.select(F.col("id").alias(href_col), "head_data"), href_col, "left"
        )
    out = links.join(ctx, href_col, "left")
    intrinsic = (
        F.coalesce(F.col(intrinsic_col), F.lit(0.0)) if intrinsic_col else F.lit(0.0)
    )
    # calculate_total_score ladder (utils.py:3459-3504) with scoring on
    # and a query provided: contextual NULL → intrinsic-only clamp
    blended = F.when(
        F.col("contextual_score").isNull(),
        F.greatest(F.lit(0.0), F.least(intrinsic, F.lit(10.0))),
    ).otherwise(
        F.greatest(
            F.lit(0.0),
            F.least(
                intrinsic * 0.7 + F.least(F.col("contextual_score") * 10.0, F.lit(10.0)) * 0.3,
                F.lit(10.0),
            ),
        )
    )
    return out.withColumn("total_score", blended)
