"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline (pure column algebra
— ``F.zip_with`` dot product inside WholeStageCodegen, one global top-k),
plus a random-hyperplane LSH bucketed variant as the 100 TB path
(candidates ∝ bucket size, not corpus size).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_sim_col(vec_col, query: list[float]):
    """Cosine similarity of a vector column against a literal query."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.dot(query, query))) or 1.0
    return _dot(vec_col.cast("array<double>"), q) / (_norm(vec_col.cast("array<double>")) * F.lit(qn))


def cosine_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Brute-force top-k by cosine similarity (desc), id asc tiebreak.

    Physical shape: narrow projection + TakeOrderedAndProject — no
    shuffle beyond the final top-k collect; scales linearly and is the
    oracle for the ANN variants.
    """
    sim = F.round(cosine_sim_col(F.col(vec_col), query), round_to)
    return (
        embeddings.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs_above(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """All-pairs cosine ≥ threshold (embedding near-dup detection).
    Exact (self-join) — use the LSH variant beyond ~10^6 vectors."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", F.round(sim, round_to))
        .where(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def hyperplane_signatures(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature (int bucket) per vector — sign-bit
    concatenation of ``n_planes`` fixed Gaussian projections. Pure column
    algebra (the planes are literal arrays), so it runs JVM-side."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    vec = F.col(vec_col).cast("array<double>")
    bits = [
        (_dot(vec, F.array(*[F.lit(float(w)) for w in planes[i]])) > 0).cast("int") * (1 << i)
        for i in range(n_planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return embeddings.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def ann_topk_lsh(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the brute-force rerank to vectors whose
    hyperplane bucket is within ``probe_hamming`` bits of the query's
    (multi-probe LSH). Recall/cost dial = (n_planes, probe_hamming)."""
    dim = len(query)
    sigs = hyperplane_signatures(embeddings, dim, n_planes, seed, id_col, vec_col)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    qbits = (planes @ np.asarray(query) > 0).astype(int)
    qbucket = int((qbits * (1 << np.arange(n_planes))).sum())
    # candidate buckets within hamming distance
    buckets = {qbucket}
    if probe_hamming >= 1:
        for i in range(n_planes):
            buckets.add(qbucket ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                buckets.add(qbucket ^ (1 << i) ^ (1 << j))
    cand = sigs.where(F.col("bucket").isin(list(buckets)))
    return cosine_topk(cand, query, k, id_col, vec_col)
