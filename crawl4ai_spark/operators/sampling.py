"""Mixture sampling: assemble a training corpus by drawing documents from
each source until that source's TOKEN budget is spent (the standard
"data mixing" step of an LLM pre-training pipeline — fixed token quotas
per domain, e.g. the mixture tables of GPT-3 / The Pile / Dolma; public
literature, the reference engine stops at crawling + extraction).

Semantics (deterministic, order-free): within each source, documents are
ranked by a portable pseudo-random key (md5 of the doc id — the same
engine≡oracle convention as the exact-dup family) and a document is kept
iff the total tokens of all earlier-ranked documents in its source is
strictly below the source's budget. So every source overshoots its budget
by at most one document, the selection is a deterministic function of the
input multiset, and re-running at any parallelism yields the same set.

Scale shape (the point of this module): the naive form is a per-source
running sum — a window partitioned by source, i.e. ONE TASK per source.
A 100 TB corpus has few sources and huge ones (CommonCrawl alone may be
90% of rows), so that window is a straggler by construction. Instead:

1. map-only: key, 256-way ORDERED bucket (top byte of the key — buckets
   partition the key space in rank order), token count;
2. one small shuffle: per-(source, bucket) token sums — at most
   ``sources × 256`` rows; prefix-sum those on the tiny frame to get
   each bucket's starting offset;
3. broadcast the offsets back and classify each bucket:
   - ``offset + bucket_sum <= budget`` → every row kept, NO sort, NO
     shuffle (map-side filter only);
   - ``offset >= budget``              → every row dropped, likewise;
   - else (the ≤1 BOUNDARY bucket per source) → only those rows — a
     1/256 sliver — shuffle into a partition-local running-sum window.

So the running sum that cannot scale is only ever evaluated on ~1/256 of
one source's rows, and per-source skew is bounded by the bucket grain,
not the source size. Costs: one aggregate shuffle of 12-byte rows, one
broadcast, one window over the boundary slivers.
"""
from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import clean_terms_col, token_count_col

__all__ = [
    "token_budget_sample",
    "temperature_budgets",
    "dsir_log_weights",
    "dsir_select",
    "pack_sequences",
]


def token_budget_sample(
    docs: DataFrame,
    budgets: dict[str, int],
    default_budget: int | None = None,
    *,
    source_col: str = "source",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    token_count: Column | None = None,
) -> DataFrame:
    """Keep, per source, the md5-ranked prefix of documents whose PRIOR
    cumulative token count is strictly below the source's budget.

    ``budgets`` maps source → token budget; sources absent from the map
    get ``default_budget`` (or are dropped entirely when it is None).
    ``token_count`` overrides the per-document token expression (default:
    the engine-wide whitespace token count over ``text_col``).

    Returns the kept rows with all input columns plus ``n_tokens``.
    """
    if not budgets and default_budget is None:
        raise ValueError("token_budget_sample needs budgets and/or default_budget")
    ntok = token_count if token_count is not None else token_count_col(F.col(text_col))
    if budgets:
        budget_map = F.create_map(
            *[F.lit(x) for kv in budgets.items() for x in (kv[0], int(kv[1]))]
        )
        budget = budget_map[F.col(source_col)]
        if default_budget is not None:
            budget = F.coalesce(budget, F.lit(int(default_budget)))
    else:
        budget = F.lit(int(default_budget))
    key = F.md5(F.col(doc_id_col).cast("string"))
    # top byte of the hex key: 256 buckets that tile the key space in
    # sort order, so per-bucket sums prefix-compose into global offsets
    bucket = F.conv(F.substring(key, 1, 2), 16, 10).cast("int")

    base = (
        docs.withColumn("n_tokens", ntok.cast("long"))
        .withColumn("_budget", budget.cast("long"))
        .where(F.col("_budget").isNotNull())
        .withColumn("_key", key)
        .withColumn("_bucket", bucket)
    )

    # phase 1: tiny frame — per-bucket sums, prefix offsets (≤256 rows
    # per source; the window here sorts ≤256 rows, not the corpus)
    sums = base.groupBy(source_col, "_bucket").agg(F.sum("n_tokens").alias("_bsum"))
    w = Window.partitionBy(source_col).orderBy("_bucket")
    offs = sums.withColumn("_off", F.sum("_bsum").over(w) - F.col("_bsum"))

    joined = base.join(F.broadcast(offs), [source_col, "_bucket"])

    # fully-inside buckets: every prior < off + bsum < budget ⇒ all rows
    # kept, no sort. Strictly-less on purpose: at off + bsum == budget a
    # trailing ZERO-token row has prior == budget and the strict-prior
    # rule drops it, so the == case must go through the window.
    full = joined.where(F.col("_off") + F.col("_bsum") < F.col("_budget"))
    # boundary buckets (≤1 per source + == edge cases): the only rows
    # that ever see the running-sum window — filtered BEFORE the window,
    # so the shuffle moves just this sliver
    wb = Window.partitionBy(source_col, "_bucket").orderBy("_key", doc_id_col)
    boundary = (
        joined.where(
            (F.col("_off") < F.col("_budget"))
            & (F.col("_off") + F.col("_bsum") >= F.col("_budget"))
        )
        .withColumn("_prior", F.sum("n_tokens").over(wb) - F.col("n_tokens") + F.col("_off"))
        .where(F.col("_prior") < F.col("_budget"))
        .drop("_prior")
    )
    drop = ["_budget", "_key", "_bucket", "_bsum", "_off"]
    return full.unionByName(boundary).drop(*drop)


# ── DSIR importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling" — public NeurIPS paper) ────
#
# Features are hashed n-gram (unigram+bigram) bucket counts; each corpus
# fits a smoothed bag-of-hashed-ngrams distribution, and a raw document's
# importance is  log w(x) = Σ_b c_b(x) · [log p_target(b) − log q_raw(b)].
# Selection takes the top-k by importance (optionally Gumbel-perturbed —
# the paper's sampling-without-replacement trick).
#
# Portability: the bucket hash is the top 52 bits of md5 (13 hex digits —
# exactly representable in BIGINT and DOUBLE on both engines), so the
# whole pipeline has a DuckDB equality oracle:
#   Spark  conv(substr(md5(g),1,13),16,10)::long % B
#   DuckDB ('0x' || substr(md5(g),1,13))::BIGINT % B
#
# Scale shape: one explode of the raw corpus into (doc, bucket) pairs →
# partial+final hash agg; the q distribution re-aggregates that compact
# frame (≤ min(grams, docs×B) rows); the p distribution is the same two
# aggs over the (much smaller) target corpus; the log-ratio table is B
# rows → broadcast; per-doc weights are one more hash agg; selection is
# TakeOrderedAndProject (global top-k with NO window and NO full sort).
# Nothing anywhere is per-source or per-corpus single-task.


def temperature_budgets(
    docs: DataFrame,
    total_tokens: int,
    alpha: float = 0.5,
    *,
    source_col: str = "source",
    text_col: str = "text",
    token_count: Column | None = None,
    granularity: int = 8,
) -> dict[str, int]:
    """Temperature-smoothed per-source token budgets — the multilingual /
    multi-domain re-balancing rule of XLM-R (Conneau 2020) and mT5 (Xue
    2021): sample source i proportional to ``p_i^alpha`` where ``p_i`` is
    its natural token share, so ``alpha=1`` reproduces the corpus mix,
    ``alpha=0`` is uniform, and the usual 0.2-0.5 range up-weights the
    tail without drowning the head. Output composes directly into
    :func:`token_budget_sample` as its ``budgets`` map.

    Determinism across engines: per-source totals are exact integers
    (one small hash aggregation; the collect is bounded by the source
    cardinality — the quantizer-sample posture), ``alpha=0.5`` reduces
    to IEEE-exact ``sqrt``, weights are fsum'd in sorted-source order,
    and each budget floors to a ``granularity`` multiple so the
    ULP-level float divergence a different engine's sum order can
    introduce never flips a budget (the driver row's DuckDB oracle
    recomputes this in SQL).
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if granularity < 1:
        raise ValueError("granularity must be >= 1")
    ntok = token_count if token_count is not None else token_count_col(F.col(text_col))
    totals = {
        r["source"]: r["t"]
        for r in docs.groupBy(F.col(source_col).alias("source"))
        .agg(F.sum(ntok).alias("t"))
        .collect()
    }
    weights = {
        s: (math.sqrt(t) if alpha == 0.5 else float(t) ** alpha) if t else 0.0
        for s, t in totals.items()
    }
    denom = math.fsum(weights[s] for s in sorted(weights))
    if denom == 0.0:
        return {s: 0 for s in weights}
    return {
        s: int(total_tokens * w / denom // granularity) * granularity
        for s, w in weights.items()
    }


def _gram_bucket_counts(
    docs: DataFrame, n_buckets: int, id_col: str | None, text_col: str
) -> DataFrame:
    """(doc_id?, b, c): hashed unigram+bigram bucket counts. With
    ``id_col=None`` returns corpus-level (b, c).

    The cleaned-token array is MATERIALIZED by its own projection before
    the bigram lambda touches it: inlining the clean-terms expression
    into the transform re-evaluates the regex clean + split once per
    bigram ELEMENT per row (and re-evaluates whatever expression produced
    the text column — a generated corpus made this O(doc_len²); measured
    32 s → 1.4 s for 5k synthetic docs). CollapseProject keeps the
    projection because the alias is non-cheap and multiply-referenced."""
    tok_proj = ([F.col(id_col).alias("doc_id")] if id_col else []) + [
        clean_terms_col(F.col(text_col)).alias("_t")
    ]
    toks = F.col("_t")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat(F.get(toks, i), F.lit(" "), F.get(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    cols = (["doc_id"] if id_col else []) + [F.explode(grams).alias("_g")]
    b = (
        F.conv(F.substring(F.md5(F.col("_g")), 1, 13), 16, 10).cast("long")
        % n_buckets
    ).alias("b")
    keys = (["doc_id"] if id_col else []) + ["b"]
    return docs.select(*tok_proj).select(*cols).select(*(keys[:-1]), b).groupBy(
        *keys
    ).agg(F.count(F.lit(1)).alias("c"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    n_buckets: int = 1024,
    smoothing: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_counts: bool = False,
) -> DataFrame:
    """(doc_id, logw): per-document DSIR importance log-weight of ``raw``
    documents toward the ``target`` corpus distribution. Documents with
    zero features (no cleaned tokens) carry no evidence and are omitted.

    The q/p totals are single-partition window sums over the ≤B-row
    bucket frames (linear lineage — a separate ``.agg()`` scalar would
    re-explode the corpus once per total). The (doc, bucket) count frame
    still has two consumers (the ratio table and the weight agg), i.e.
    two gram-explode passes over ``raw``; pass ``persist_counts=True`` to
    cache it and make the whole operator one pass per corpus (caller owns
    the persisted frame's lifetime via the returned plan).
    """
    if n_buckets < 1 or smoothing <= 0:
        raise ValueError("n_buckets >= 1 and smoothing > 0 required")
    dc = _gram_bucket_counts(raw, n_buckets, id_col, text_col)
    if persist_counts:
        dc = dc.persist()
    one = Window.partitionBy(F.lit(1))
    q = (
        dc.groupBy("b")
        .agg(F.sum("c").alias("qc"))
        .withColumn("qt", F.sum("qc").over(one))
    )
    p = (
        _gram_bucket_counts(target, n_buckets, None, text_col)
        .withColumnRenamed("c", "pc")
        .withColumn("pt", F.sum("pc").over(one))
    )
    a, bb = float(smoothing), float(n_buckets)
    ratio = (
        q.join(p, "b", "left")
        # pt is a constant of the p frame; unmatched rows carry NULL —
        # refill it across the B-row frame (empty target ⇒ 0)
        .withColumn("pt", F.coalesce(F.max("pt").over(one), F.lit(0)))
        .select(
            "b",
            (
                F.log((F.coalesce(F.col("pc"), F.lit(0)) + a) / (F.col("pt") + a * bb))
                - F.log((F.col("qc") + a) / (F.col("qt") + a * bb))
            ).alias("_lr"),
        )
    )
    return dc.join(F.broadcast(ratio), "b").groupBy("doc_id").agg(
        F.sum(F.col("c") * F.col("_lr")).alias("logw")
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    *,
    n_buckets: int = 1024,
    smoothing: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    gumbel_seed: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` raw documents by DSIR importance (doc_id, logw, rank_key).

    With ``gumbel_seed`` the rank key is Gumbel-perturbed (the paper's
    without-replacement sampler), still deterministic and portable: the
    uniform comes from md5(seed ‖ doc_id). Weights are rounded before
    ranking so the (key, doc_id) order is identical across engines.
    """
    w = dsir_log_weights(
        raw,
        target,
        n_buckets=n_buckets,
        smoothing=smoothing,
        id_col=id_col,
        text_col=text_col,
    ).withColumn("logw", F.round("logw", round_digits))
    key = F.col("logw")
    if gumbel_seed is not None:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(gumbel_seed), F.col("doc_id").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        u = (h + 0.5) / float(16**13)  # uniform in (0, 1), hash-derived
        key = F.round(key - F.log(-F.log(u)), round_digits)
    out = w.withColumn("rank_key", key)
    return out.orderBy(F.desc("rank_key"), F.asc("doc_id")).limit(int(k))


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count: Column | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """Sequence packing (concat-and-chunk, the GPT-3/T5 example-assembly
    step): documents are concatenated in a deterministic pseudo-shuffled
    order (md5 of the doc id — packing wants decorrelated neighbors, so
    the hash order is a feature) and the token stream is cut every
    ``seq_len`` tokens. Returns the assembly map a trainer consumes, one
    row per (chunk, document-slice):

      chunk_id        — 0-based training-example index
      doc_id          — source document
      doc_tok_start   — first token of the slice within the doc (0-based)
      doc_tok_end     — one past the last token of the slice
      chunk_pos       — where the slice starts inside the chunk

    Zero-token documents occupy no stream positions and are omitted.

    Scale shape: every document needs its GLOBAL stream offset — a naive
    corpus-wide running sum is one task. Same cure as
    ``token_budget_sample``: 256 ordered key buckets, per-bucket sums →
    a ≤256-row prefix frame (the only single-task step, on 256 rows),
    broadcast back, then the per-row running sum is a window partitioned
    by BUCKET — 256-way parallel, skew bounded by the bucket grain. The
    chunk fan-out afterwards is closed-form column algebra + one
    ``sequence`` explode (≈ n_tokens/seq_len rows per doc).
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    ntok = token_count if token_count is not None else token_count_col(F.col(text_col))
    key = F.md5(F.col(id_col).cast("string"))
    bucket = F.conv(F.substring(key, 1, 2), 16, 10).cast("int")
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            ntok.cast("long").alias("_nt"),
            key.alias("_key"),
            bucket.alias("_bucket"),
        )
        .where(F.col("_nt") > 0)
    )
    sums = base.groupBy("_bucket").agg(F.sum("_nt").alias("_bsum"))
    # unpartitioned window on ≤256 rows — the deliberate tiny serial step
    offs = sums.withColumn(
        "_boff", F.sum("_bsum").over(Window.orderBy("_bucket")) - F.col("_bsum")
    ).select("_bucket", "_boff")
    wb = Window.partitionBy("_bucket").orderBy("_key", "doc_id")
    L = int(seq_len)
    with_off = (
        base.join(F.broadcast(offs), "_bucket")
        .withColumn(
            "_off", F.sum("_nt").over(wb) - F.col("_nt") + F.col("_boff")
        )
    )
    first = F.expr(f"_off div {L}")
    last = F.expr(f"(_off + _nt - 1) div {L}")
    out = with_off.select(
        "doc_id",
        "_nt",
        "_off",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    )
    return out.select(
        "chunk_id",
        "doc_id",
        F.greatest(F.lit(0).cast("long"), F.col("chunk_id") * L - F.col("_off")).alias(
            "doc_tok_start"
        ),
        F.least(F.col("_nt"), (F.col("chunk_id") + 1) * L - F.col("_off")).alias(
            "doc_tok_end"
        ),
        F.when(F.col("chunk_id") == F.expr(f"_off div {L}"), F.col("_off") % L)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("chunk_pos"),
    )
