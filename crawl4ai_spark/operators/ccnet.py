"""CCNet corpus curation (Wenzek et al. 2020, "CCNet: Extracting high
quality monolingual datasets from web crawl data") — the canonical
Common-Crawl → LM-training-corpus pipeline, re-expressed Spark-first.
Public literature; the reference engine (crawl4ai) stops at crawling +
extraction, this is the downstream stage its output feeds.

Three stages, exactly the paper's shape:

1. **Paragraph-level dedup** (§4.1): split each document into
   paragraphs, normalize each (lowercase, digits → ``0``, strip
   punctuation, collapse whitespace — the paper's normalization), and
   drop every duplicate occurrence corpus-wide, keeping the globally
   first ``(doc_id, para_idx)``. This removes boilerplate (cookie
   banners, copyright footers, navigation) that repeats across pages —
   the paper reports ~70% of CC text removed here.
2. **Language ID** (§4.2): classify the deduplicated text (the paper's
   fastText → this repo's stopword-panel heuristic, the documented
   model-free stand-in) and gate on a minimum confidence.
3. **LM perplexity bucketing** (§4.3): score each surviving document
   with a corpus-trained LM (the paper's KenLM 5-gram → this repo's
   Stupid-Backoff trigram, :mod:`.lm_score`) and split each language
   into **head / middle / tail** thirds by score — head = most fluent.
   Cutoffs are per-language score percentiles, exactly the paper.

Scale shape (the point — CCNet's own impl is a single-node shard loop):

- Stage 1 is one explode (map-side), one hash aggregation on an 8-byte
  ``xxhash64(norm)`` key with a ``min(struct)`` partial aggregate, and
  one join back on the same key (co-partitioned, AQE-reusable). Doc
  reconstruction groups by doc id; per-doc memory is bounded by that
  document's own paragraph count — the same posture as
  ``exact_substring_dedup``'s reconstruction.
- Stage 2 is a pure column projection (zero shuffles).
- Stage 3 trains the LM with hash aggregations (see
  :func:`~.lm_score.stupid_backoff_scores`), then derives per-language
  cutoffs from a **score histogram**, never a per-language sort: scores
  are bucketed to ``bucket_round`` decimals, the ``(lang, bucket)``
  count frame is tiny (≤ ~10^(bucket_round+1) · score-range rows per
  language), the cumulative-fraction window runs on that tiny frame
  only, and the ≤ |langs| · 2 cutoff rows broadcast back. No stage ever
  sorts or windows the corpus itself — this is the
  ``token_budget_sample`` bounded-prefix-frame play applied to
  percentile cutoffs.

The survivor frame fans out to several consumers (LM scoring, the
score histogram, final assembly) WITHOUT an explicit persist, same
rationale as :mod:`.lm_score`: the repeated subtrees are byte-identical
plan fragments whose shuffle outputs Spark reuses at runtime, and an
A/B at sf0.1 (5k docs, local[8]) measured MEMORY_AND_DISK persist of
the survivor+scored frames strictly slower — 8.5 s vs 4.4 s warm — the
cache write costs more than the deduped recompute.

Determinism: keeper choice is ``min(doc_id, para_idx)`` (order-free),
bucket membership is a pure function of the rounded score and the
cutoffs, and cutoffs are pure functions of the histogram — re-running at
any parallelism yields the same corpus.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import LANG_STOPWORDS

__all__ = [
    "ccnet_pipeline",
    "normalize_paragraph_col",
    "paragraph_dedup_incremental",
]

# head / middle / tail thirds — the paper's default split (§4.3)
HEAD_FRAC = 1.0 / 3.0
MIDDLE_FRAC = 1.0 / 3.0


def normalize_paragraph_col(para):
    """CCNet paragraph normalization as a pure column expression:
    lowercase → digits→``0`` → strip everything but ``[a-z0 ]`` →
    collapse runs of spaces → trim. Mirrored verbatim in the SQL oracle
    (``__spark_entry__``) so engine and oracle cannot drift."""
    x = F.lower(para)
    x = F.regexp_replace(x, "[0-9]", "0")
    x = F.regexp_replace(x, "[^a-z0 ]", "")
    x = F.regexp_replace(x, " +", " ")
    return F.trim(x)


def _sql_str(s: str) -> str:
    """Escape a Python string into a Spark-SQL single-quoted literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'").replace("\n", "\\n") + "'"


def _langid_sql_fragments() -> tuple[str, str, str]:
    """(hit_cols, argmax_case, langs_csv) over a token-array column ``t``
    — panels imported from the shared table so this builder, the column
    API in :mod:`.textstats`, and the DuckDB oracle cannot drift. The
    argmax CASE tests languages in sorted order, i.e. ties break to the
    lexicographic minimum — exactly ``textstats.langid_best``."""
    langs = sorted(LANG_STOPWORDS)
    hit_cols = ",\n               ".join(
        "size(array_intersect(t, array("
        + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        + f"))) AS {lang}"
        for lang in langs
    )
    case = " ".join(f"WHEN {lang} = m THEN '{lang}'" for lang in langs)
    return hit_cols, case, ", ".join(langs)


def ccnet_pipeline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    para_sep: str = "\n",
    min_lang_hits: int = 1,
    head_frac: float = HEAD_FRAC,
    middle_frac: float = MIDDLE_FRAC,
    bucket_round: int = 3,
    alpha: float = 0.4,
    round_to: int = 6,
) -> DataFrame:
    """Run the full CCNet pass over ``docs`` (``id_col``, ``text_col``
    with ``para_sep``-separated paragraphs).

    Returns one row per SURVIVING document (≥1 kept paragraph and
    language confidence ≥ ``min_lang_hits``)::

        (doc_id, lang_pred, lang_hits, n_paras_total, n_paras_kept,
         n_tokens, lm_logscore, ppl_bucket, dedup_md5)

    ``ppl_bucket`` ∈ {'head','middle','tail'} — per-language thirds by
    ``lm_logscore`` (mean log10 Stupid-Backoff probability; HIGHER =
    more fluent = head, the inverse of perplexity). A document whose
    deduplicated text yields no scorable tokens goes to ``tail``
    (unscorable ≠ fluent). ``dedup_md5`` is the md5 hex of the
    reconstructed deduplicated text — the byte-exact reconstruction
    pin. Boundary buckets are INCLUDED in the better tier, so tiers are
    ≥ the requested fractions by at most one score-bucket's mass.

    The plan is built as ONE Spark-SQL statement (a temp view + one
    ``spark.sql`` call): the DataFrame-API formulation resolved its
    ~30-operator lineage once per appended operator (O(depth²) driver
    analysis — 5.3 s of plan-build at sf0.1, half the query's wall),
    the SQL text is analyzed once. Same physical plan family, same
    results (the full-equality DuckDB oracle and the pytests pin both).
    """
    if not (0 < head_frac and head_frac + middle_frac <= 1):
        raise ValueError("head_frac/middle_frac must be positive with sum <= 1")
    spark = docs.sparkSession
    sep = _sql_str(para_sep)
    hit_cols, lang_case, langs_csv = _langid_sql_fragments()
    hf = repr(float(head_frac))
    mf = repr(float(head_frac + middle_frac))
    a = repr(float(alpha))
    view = "__ccnet_in__"
    docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).createOrReplaceTempView(view)
    sql = f"""
    WITH paras AS (
        -- stage 1: paragraph stream + the paper's normalization hash
        SELECT doc_id, para_idx, para,
               xxhash64(trim(regexp_replace(regexp_replace(regexp_replace(
                   lower(para), '[0-9]', '0'), '[^a-z0 ]', ''), ' +', ' '))) AS h
        FROM {view}
        LATERAL VIEW posexplode(split(text, {sep})) AS para_idx, para
        WHERE length(trim(para)) > 0),
    keepers AS (
        -- keep the global first occurrence: one 8-byte-key hash agg
        SELECT h, min(struct(doc_id, para_idx)) AS keep FROM paras GROUP BY h),
    kept AS (
        SELECT p.doc_id, p.para_idx, p.para
        FROM paras p JOIN keepers k ON p.h = k.h
        WHERE p.doc_id = k.keep.doc_id AND p.para_idx = k.keep.para_idx),
    totals AS (SELECT doc_id, count(*) AS n_paras_total FROM paras GROUP BY doc_id),
    surv0 AS (
        -- byte-exact reconstruction, bounded by the doc's own paragraphs
        SELECT doc_id, count(*) AS n_paras_kept,
               array_join(transform(array_sort(collect_list(struct(para_idx, para))),
                                    x -> x.para), {sep}) AS text_dedup
        FROM kept GROUP BY doc_id),
    surv1 AS (SELECT s.*, t.n_paras_total FROM surv0 s JOIN totals t USING (doc_id)),
    -- stage 2: stopword-panel language gate (pure projection)
    lhits AS (
        SELECT *, {hit_cols}
        FROM (SELECT *, split(lower(trim(text_dedup)), '\\\\s+') AS t FROM surv1)),
    lang AS (
        SELECT doc_id, n_paras_total, n_paras_kept, text_dedup,
               m AS lang_hits, CASE {lang_case} END AS lang_pred
        FROM (SELECT *, greatest({langs_csv}) AS m FROM lhits)
        WHERE m >= {int(min_lang_hits)}),
    -- stage 3: Stupid-Backoff trigram LM over the deduplicated text
    -- (mirrors lm_score.stupid_backoff_scores; counts are hash aggs,
    -- scoring is distributed hash joins on the gram keys)
    -- (pos, w, w1, w2) straight off the token array — no per-doc lag
    -- window, so no per-doc sort; the REPARTITION hint is the deliberate
    -- materialization point its four consumers reuse (1 survivor-frame
    -- pass instead of 4 — see lm_score.py's A/B)
    ctx AS (
        SELECT /*+ REPARTITION(doc_id) */ doc_id, e.pos, e.w, e.w1, e.w2
        FROM (SELECT doc_id, ct
              FROM (SELECT doc_id,
                           filter(split(trim(regexp_replace(lower(text_dedup),
                                  '[^a-z0-9 ]', '')), '\\\\s+'),
                                  x -> length(x) > 2) AS ct
                    FROM lang)
              WHERE size(ct) > 0)
        LATERAL VIEW explode(transform(sequence(0, size(ct) - 1),
            i -> struct(i AS pos, ct[i] AS w,
                        CASE WHEN i >= 1 THEN ct[i-1] END AS w1,
                        CASE WHEN i >= 2 THEN ct[i-2] END AS w2))) AS e),
    uni AS (SELECT w, count(*) AS c1 FROM ctx GROUP BY w),
    tot AS (SELECT sum(c1) AS n_total FROM uni),
    big AS (SELECT w1, w, count(*) AS c2 FROM ctx WHERE w1 IS NOT NULL GROUP BY w1, w),
    tri AS (SELECT w2, w1, w, count(*) AS c3 FROM ctx
            WHERE w2 IS NOT NULL GROUP BY w2, w1, w),
    lm_scored AS (
        SELECT c.doc_id,
               CASE
                 WHEN c.w2 IS NOT NULL THEN
                   CASE WHEN t3.c3 IS NOT NULL THEN t3.c3 / bd.c2
                        WHEN bn.c2 IS NOT NULL THEN {a} * (bn.c2 / ud.c1)
                        ELSE {a} * ({a} * (un.c1 / tot.n_total)) END
                 WHEN c.w1 IS NOT NULL THEN
                   CASE WHEN bn.c2 IS NOT NULL THEN bn.c2 / ud.c1
                        ELSE {a} * (un.c1 / tot.n_total) END
                 ELSE un.c1 / tot.n_total
               END AS s
        FROM ctx c
        LEFT JOIN tri t3 ON t3.w2 = c.w2 AND t3.w1 = c.w1 AND t3.w = c.w
        LEFT JOIN big bd ON bd.w1 = c.w2 AND bd.w = c.w1
        LEFT JOIN big bn ON bn.w1 = c.w1 AND bn.w = c.w
        LEFT JOIN uni ud ON ud.w = c.w1
        LEFT JOIN uni un ON un.w = c.w
        CROSS JOIN tot),
    per_doc AS (
        SELECT doc_id, count(*) AS n_tokens,
               round(avg(log10(s)), {int(round_to)}) AS lm_logscore
        FROM lm_scored GROUP BY doc_id),
    frame AS (
        SELECT l.*, CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               p.lm_logscore, round(p.lm_logscore, {int(bucket_round)}) AS b
        FROM lang l LEFT JOIN per_doc p USING (doc_id)),
    -- head/middle/tail cutoffs from the TINY (lang, bucket) histogram;
    -- the corpus itself is never sorted or windowed
    hist AS (
        SELECT lang_pred, b, count(*) AS c FROM frame
        WHERE lm_logscore IS NOT NULL GROUP BY lang_pred, b),
    fr AS (
        SELECT lang_pred, b,
               sum(c) OVER (PARTITION BY lang_pred ORDER BY b DESC) /
               sum(c) OVER (PARTITION BY lang_pred) AS frac
        FROM hist),
    cuts AS (
        SELECT lang_pred,
               max(CASE WHEN frac >= {hf} THEN b END) AS c1,
               max(CASE WHEN frac >= {mf} THEN b END) AS c2
        FROM fr GROUP BY lang_pred)
    -- cuts is <= |langs| rows: AQE plans the join as broadcast at runtime
    SELECT f.doc_id, f.lang_pred, f.lang_hits, f.n_paras_total,
           f.n_paras_kept, f.n_tokens, f.lm_logscore,
           CASE WHEN f.b >= c.c1 THEN 'head'
                WHEN f.b >= c.c2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket,
           md5(CAST(f.text_dedup AS BINARY)) AS dedup_md5
    FROM frame f LEFT JOIN cuts c USING (lang_pred)
    """
    return spark.sql(sql)


def paragraph_dedup_incremental(
    new_docs: DataFrame,
    seen_paras: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    para_sep: str = "\n",
) -> tuple[DataFrame, DataFrame]:
    """Batch-incremental CCNet stage 1 — paragraph dedup against the
    HISTORY of everything already curated, so curation keeps pace with
    the crawl instead of re-running over the full corpus per wave (the
    WaveStore play applied to paragraph hashes; the crawl loop's bloom +
    anti-join discovery dedup is the same shape at URL grain).

    ``seen_paras`` is the persisted store from prior waves — one column
    ``h`` (the 8-byte xxhash64 of the normalized paragraph), or ``None``
    for the first wave. A paragraph is dropped if its hash is in the
    store (a prior wave keeps it) or a smaller ``(doc_id, para_idx)`` in
    THIS batch keeps it — so processing waves in doc-id order yields
    exactly the corpus-wide keep-global-first result of
    :func:`ccnet_pipeline` stage 1 (pinned by a pytest equivalence).

    Returns ``(survivors, new_seen)``:

    - ``survivors``: ``(doc_id, n_paras_total, n_paras_kept,
      text_dedup)`` — docs from this batch with ≥ 1 kept paragraph,
      byte-exact reconstruction, the frame the downstream gates
      (language, LM, classifier) consume.
    - ``new_seen``: the store to persist for the next wave = old store ∪
      this batch's first-occurrence hashes. Append-only and distinct on
      ``h``; at 100 TB this is the paragraph analogue of the URL seen
      set (8 bytes a row, hash-partitionable, bloom-frontable).

    Scale shape per wave: one explode over the NEW batch only, one
    left-anti hash join against the store on ``h`` (both sides 8-byte
    keys), one keep-first hash agg, one co-partitioned reconstruction —
    the store is never rewritten, only appended.
    """
    paras = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), para_sep)).alias("para_idx", "para"),
    ).where(F.length(F.trim("para")) > 0)
    paras = paras.withColumn("h", F.xxhash64(normalize_paragraph_col(F.col("para"))))
    totals = paras.groupBy("doc_id").agg(F.count("*").alias("n_paras_total"))
    fresh = (
        paras.join(seen_paras.select("h"), "h", "left_anti")
        if seen_paras is not None
        else paras
    )
    keepers = fresh.groupBy("h").agg(
        F.min(F.struct("doc_id", "para_idx")).alias("keep")
    )
    kept = (
        fresh.join(keepers, "h")
        .where(
            (F.col("doc_id") == F.col("keep.doc_id"))
            & (F.col("para_idx") == F.col("keep.para_idx"))
        )
        .select("doc_id", "para_idx", "para", "h")
    )
    survivors = (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                    lambda x: x["para"],
                ),
                para_sep,
            ).alias("text_dedup"),
        )
        .join(totals, "doc_id")
        .select("doc_id", "n_paras_total", "n_paras_kept", "text_dedup")
    )
    batch_hashes = kept.select("h").distinct()
    new_seen = (
        seen_paras.select("h").unionByName(batch_hashes).distinct()
        if seen_paras is not None
        else batch_hashes
    )
    return survivors, new_seen
