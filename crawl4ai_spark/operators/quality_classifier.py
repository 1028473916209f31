"""Trained quality-classifier filtering (Brown et al. 2020 "Language
Models are Few-Shot Learners" appendix A; the same shape as LLaMA's
CCNet/Wikipedia-reference classifier) — the model-based curation step
next to the rule batteries (Gopher/C4) and the LM scorer: train a
logistic-regression classifier to recognize "looks like the reference
corpus" documents, score every document, and keep a document iff

    pareto_draw > 1 - score        with  pareto_draw ~ Pareto(alpha)

(GPT-3's published re-inclusion rule, alpha = 9: high-scoring documents
are almost always kept, low-scoring ones survive occasionally so the
tail stays represented).

Spark-first shape — the published pipelines' own posture:

- **Training is bounded and driver-side** (GPT-3 trained its classifier
  on a sample, not the corpus): a deterministic hash-ordered sample
  (``ORDER BY xxhash64(doc_id), doc_id LIMIT sample`` — a
  TakeOrderedAndProject, never a full collect) is featurized and fit
  with plain full-batch gradient descent in numpy. The same
  :func:`featurize` + :func:`lr_train` core is importable offline, so
  an oracle can retrain bit-identical weights without Spark (the
  IVF-quantizer / k-means-centroid play).
- **Scoring is the at-scale half and is fully distributed**: hashed
  unigram+bigram bucket counts (the DSIR front end — one explode + one
  hash agg on (doc_id, bucket)), then the logit is a FIXED-ORDER fold
  over the per-doc bucket vector (sorted by bucket id) so the float sum
  is partitioning-independent AND engine-portable — the SQL twin folds
  the identically-ordered list. Weights ride along as a B-element array
  literal (B ~ 512 — column-plan sized, never a shuffle side).
- **Selection is map-only column algebra**: the Pareto draw comes from
  md5(seed ‖ doc_id) (the dsir_select uniform), so the kept set is a
  pure function of (doc_id, weights, seed) at any parallelism.

Feature hashing is the md5-top-52-bit bucket contract shared with
:mod:`.sampling` (portable: Spark ``conv(substr(md5(g),1,13),16,10)``
≡ DuckDB ``('0x' || substr(md5(g),1,13))::BIGINT``).
"""
from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "featurize",
    "lr_train",
    "fit_quality_classifier",
    "score_quality",
    "pareto_select",
]


# ── shared featurizer (engine fit, oracle replica, tests) ────────────────
def featurize(text: str, n_buckets: int) -> dict[int, int]:
    """Hashed unigram+bigram bucket counts of one document — the exact
    pure-Python mirror of :func:`.sampling._gram_bucket_counts` (cleaned
    terms: lowercase, alnum-only, len > 2; md5-top-52-bit buckets)."""
    cleaned = re.sub(r"[^a-z0-9 ]", "", text.lower()).strip()
    toks = [w for w in re.split(r"\s+", cleaned) if len(w) > 2]
    grams = toks + [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
    out: dict[int, int] = {}
    for g in grams:
        b = int(hashlib.md5(g.encode()).hexdigest()[:13], 16) % n_buckets
        out[b] = out.get(b, 0) + 1
    return out


def lr_train(
    rows: list[dict[int, int]],
    labels: list[int],
    n_buckets: int,
    *,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-4,
):
    """Deterministic full-batch gradient-descent logistic regression on
    term-frequency-normalized hashed features. Returns
    ``(weights: list[float] of len n_buckets, bias: float)`` — pure
    float64 numpy, no randomness, so engine and oracle retrains are
    bit-identical from the same sample."""
    import numpy as np

    n = len(rows)
    if n == 0:
        raise ValueError("lr_train needs a non-empty sample")
    X = np.zeros((n, n_buckets), dtype=np.float64)
    for i, counts in enumerate(rows):
        tot = float(sum(counts.values())) or 1.0
        for b, c in counts.items():
            X[i, b] = c / tot
    y = np.asarray(labels, dtype=np.float64)
    w = np.zeros(n_buckets, dtype=np.float64)
    bias = 0.0
    for _ in range(int(iters)):
        z = X @ w + bias
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        gw = (X.T @ err) / n + l2 * w
        gb = float(err.mean())
        w -= lr * gw
        bias -= lr * gb
    return [float(v) for v in w], float(bias)


def fit_quality_classifier(
    docs: DataFrame,
    positive,
    *,
    n_buckets: int = 512,
    sample: int = 2_000,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Fit the classifier on a bounded deterministic sample of ``docs``
    (``positive`` is a boolean Column — the "looks like the reference
    corpus" label). Hash-ordered sampling ⇒ the same documents are chosen
    at any parallelism or scale factor, and an offline replica can
    reproduce the sample from the raw table with
    :func:`crawl4ai_spark.functions.fingerprint.xxhash64_longs`.

    The collect is capped at ``sample`` rows by a TakeOrderedAndProject
    (the k-means-centroid posture, similarity.py) — never a corpus
    collect. Returns ``(weights, bias)``."""
    taken = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.col(text_col).alias("_text"),
            positive.cast("int").alias("_y"),
        )
        .orderBy(F.xxhash64(F.col("_id")), F.col("_id"))
        .limit(int(sample))
        .collect()
    )
    rows = [featurize(r["_text"] or "", n_buckets) for r in taken]
    labels = [int(r["_y"] or 0) for r in taken]
    return lr_train(rows, labels, n_buckets, iters=iters, lr=lr, l2=l2)


def score_quality(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    *,
    n_buckets: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, n_grams, qc_score): sigmoid classifier score per document,
    fully distributed. One gram explode + one (doc_id, bucket) hash agg +
    one hash agg by doc; the dot product folds the bucket-sorted per-doc
    vector in fixed order (term ``w[b] * (c/total)``, same sequence the
    SQL oracle folds), so the score is partitioning-independent. Docs
    with zero features score ``sigmoid(bias)``."""
    from .sampling import _gram_bucket_counts

    B = int(n_buckets) if n_buckets is not None else len(weights)
    if B != len(weights):
        raise ValueError("n_buckets must equal len(weights)")
    # one true array LITERAL (F.lit of the list), NOT F.array(*lits):
    # CreateArray of B literals is re-constructed per fold step per row —
    # at B=512 that turned the scoring fold into ~10^10 array builds and
    # hung a 250k-doc leg; the Literal is materialized once
    w_lit = F.lit([float(v) for v in weights])
    dc = _gram_bucket_counts(docs, B, id_col, text_col)
    per_doc = dc.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.sort_array(F.collect_list(F.struct(F.col("b"), F.col("c")))).alias("_v"),
    )
    tot = F.col("n_grams").cast("double")
    logit = F.aggregate(
        F.col("_v"),
        F.lit(float(bias)),
        lambda acc, s: acc + F.get(w_lit, s["b"]) * (s["c"].cast("double") / tot),
    )
    scored = per_doc.select(
        "doc_id",
        "n_grams",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), round_to).alias("qc_score"),
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    no_feat = round(1.0 / (1.0 + __import__("math").exp(-float(bias))), round_to)
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("qc_score", F.lit(no_feat)).alias("qc_score"),
    )


def pareto_select(
    scored: DataFrame,
    *,
    alpha: float = 9.0,
    seed: str = "qc",
    score_col: str = "qc_score",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """GPT-3's document re-inclusion rule as map-only column algebra:
    keep iff ``pareto_draw > 1 - score`` with
    ``pareto_draw = (1-u)^(-1/alpha) - 1`` and the uniform ``u`` derived
    from md5(seed ‖ doc_id) (the dsir_select construction). Both the draw
    and the threshold are rounded to ``round_to`` before comparing so the
    kept set is engine-portable. Adds ``pareto_draw`` and ``keep``."""
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("double")
    u = (h + 0.5) / float(16**13)
    draw = F.round(
        F.pow(F.lit(1.0) - u, F.lit(-1.0 / float(alpha))) - F.lit(1.0), round_to
    )
    thr = F.round(F.lit(1.0) - F.col(score_col), round_to)
    return scored.select(
        "*",
        draw.alias("pareto_draw"),
        (draw > thr).cast("int").alias("keep"),
    )
