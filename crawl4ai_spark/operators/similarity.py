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
    q = F.lit([float(x) for x in query])
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
        (_dot(vec, F.lit([float(w) for w in planes[i]])) > 0).cast("int") * (1 << i)
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
    bucket_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: restrict the brute-force rerank to vectors whose
    hyperplane bucket is within ``probe_hamming`` bits of the query's
    (multi-probe LSH). Recall/cost dial = (n_planes, probe_hamming).

    ``bucket_col`` names a PRECOMPUTED signature column (same planes:
    ``hyperplane_signatures`` with identical n_planes/seed) — the scale
    path: signatures are materialized once at ingest, so a query is a
    bucket-membership filter (parquet pushdown / partition pruning on the
    bucket column) plus a rerank of the candidates, never a full-corpus
    projection. Without it the signatures are computed inline."""
    dim = len(query)
    if bucket_col is not None:
        sigs = embeddings.select(
            F.col(id_col), F.col(vec_col), F.col(bucket_col).alias("bucket")
        )
    else:
        sigs = hyperplane_signatures(embeddings, dim, n_planes, seed, id_col, vec_col)
    buckets = probe_buckets(query, n_planes, seed, probe_hamming)
    cand = sigs.where(F.col("bucket").isin(buckets))
    return cosine_topk(cand, query, k, id_col, vec_col)


def probe_buckets(
    query: list[float],
    n_planes: int,
    seed: int = 42,
    probe_hamming: int = 1,
) -> list[int]:
    """The multi-probe bucket set for ``query``: its hyperplane bucket
    plus every bucket within ``probe_hamming`` bit flips (≤ Σ C(n_planes,
    r) probes). Returned as a plain literal list so callers can feed it
    to an IN filter — which Spark pushes to parquet AND uses for
    partition pruning when the signature store is ``partitionBy(bucket)``
    (the at-scale layout: a query then reads only the probed directories,
    ~|buckets|/2^n_planes of the corpus)."""
    dim = len(query)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    qbits = (planes @ np.asarray(query) > 0).astype(int)
    qbucket = int((qbits * (1 << np.arange(n_planes))).sum())
    from itertools import combinations

    buckets = {qbucket}
    for r in range(1, probe_hamming + 1):
        for flips in combinations(range(n_planes), r):
            m = 0
            for i in flips:
                m |= 1 << i
            buckets.add(qbucket ^ m)
    return sorted(buckets)


def hyperplane_banded_buckets(
    embeddings: DataFrame,
    dim: int,
    bands: int = 8,
    planes_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) — banded random-hyperplane LSH, the pair-search
    analog of :func:`hyperplane_signatures` (which serves point queries).

    One band = ``planes_per_band`` sign bits; two vectors at angle θ share
    a band's bucket with probability (1 − θ/π)^planes_per_band, and
    collide in ≥1 of ``bands`` independent bands with probability
    1 − (1 − p)^bands — the same S-curve construction as MinHash banding
    (``dedup.lsh_banded_buckets``), tuned for cosine instead of Jaccard.
    Single projection pass: all bands' planes evaluated in one JVM-side
    projection, then ``posexplode`` fans out the band rows."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((bands * planes_per_band, dim))
    vec = F.col(vec_col).cast("array<double>")
    band_buckets = []
    for b in range(bands):
        bucket = None
        for r in range(planes_per_band):
            i = b * planes_per_band + r
            bit = (_dot(vec, F.lit([float(w) for w in planes[i]])) > 0).cast(
                "int"
            ) * (1 << r)
            bucket = bit if bucket is None else bucket + bit
        band_buckets.append(bucket)
    return embeddings.select(
        F.col(id_col),
        F.posexplode(F.array(*band_buckets)).alias("band", "bucket"),
    )


def cosine_neardup_lsh_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    bands: int = 8,
    planes_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs at scale: banded hyperplane LSH
    candidates, exact-cosine verified — the 10⁹-vector path for which
    :func:`cosine_pairs_above` (all-pairs self-join) is the small-scale
    oracle. Output ⊆ the exact answer (precision 1 by construction);
    recall is the banding S-curve, pinned by test.

    ``max_bucket_size`` mirrors the MinHash/SimHash degenerate-bucket cap:
    a bucket of B mutual near-dups yields B²/2 candidates, so capped
    buckets drop out of the self-join and recall degrades gracefully
    (pairs usually still collide in another band). Audit with
    :func:`lsh_pair_bucket_stats` before capping — no silent truncation.
    """
    if dim is None:
        # skip NULL embeddings (audit rows from failed upstream encoders)
        # instead of len(None)-crashing on an unlucky first row
        head = embeddings.select(vec_col).where(F.col(vec_col).isNotNull()).head()
        dim = len(head[0]) if head else 0
    banded = hyperplane_banded_buckets(
        embeddings, dim, bands, planes_per_band, seed, id_col, vec_col
    )
    if max_bucket_size is not None:
        sizes = lsh_pair_bucket_stats(banded, min_size=2)
        keep = sizes.where(F.col("size") <= max_bucket_size).select("band", "bucket")
        banded = banded.join(keep, ["band", "bucket"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a." + id_col) < F.col("b." + id_col)),
        )
        .select(
            F.col("a." + id_col).alias("id_a"), F.col("b." + id_col).alias("id_b")
        )
        .distinct()
    )
    va = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    vb = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb")
    )
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine_sim", F.round(sim, round_to))
        .where(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def lsh_pair_bucket_stats(banded: DataFrame, min_size: int = 2) -> DataFrame:
    """(band, bucket, size) audit view for the near-dup bucket cap."""
    from crawl4ai_spark.operators.dedup import bucket_stats

    return bucket_stats(banded, ["band", "bucket"], min_size)


def lloyd_kmeans(data: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd's k-means on unit-normalized rows → (k, dim) unit
    centroids. Pure numpy, fully deterministic given (data order, k,
    iters, seed). Shared by :func:`kmeans_centroids` and the DuckDB
    oracle builder (``__spark_entry__._kmeans_centroids_offline``) so the
    two can never drift."""
    norms = np.linalg.norm(data, axis=1, keepdims=True)
    data = data / np.clip(norms, 1e-12, None)
    rng = np.random.RandomState(seed)
    centroids = data[rng.choice(len(data), size=min(k, len(data)), replace=False)]
    for _ in range(iters):
        sims = data @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = data[assign == c]
            if len(members):
                center = members.mean(axis=0)
                centroids[c] = center / max(np.linalg.norm(center), 1e-12)
    return centroids


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 16,
    dim: int | None = None,
    iters: int = 8,
    sample: int = 10_000,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Driver-side Lloyd's k-means on a bounded sample → (k, dim) centroid
    matrix. The IVF coarse quantizer: training is O(sample), assignment is
    distributed column algebra. Deterministic end to end: the sample is
    ordered by ``xxhash64(id, seed)`` with id tiebreak (an unordered
    ``limit()`` is layout-dependent — centroids would differ across
    runs/partitionings; the id-hash order is also recomputable off-Spark
    via ``functions.fingerprint.xxhash64_longs``, which is what lets the
    DuckDB oracle pin these centroids), init is seeded, iters fixed."""
    rows = (
        embeddings.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col), F.lit(seed).cast("long")))
        .orderBy("_h", id_col)
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    data = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    return lloyd_kmeans(data, k, iters, seed)


ASSIGN_LITERAL_MAX_K = 32


def ivf_assign(
    embeddings: DataFrame, centroids: np.ndarray, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Assign each vector to its nearest centroid (argmax cosine).

    Two physical strategies, same result:
    - small k (≤ ASSIGN_LITERAL_MAX_K): pure column algebra over centroid
      literals — one codegen'd map stage, zero Python;
    - larger k: a vectorized pandas UDF with the (k, dim) centroid matrix
      in the closure (numpy matmul per Arrow batch) — literal expressions
      at production k (≥256) explode the Catalyst expression tree, so
      this is the scale path.
    Either way one map stage; the table can be repartitioned/bucketed by
    ``ivf_cell`` for cell-local search.
    """
    if len(centroids) <= ASSIGN_LITERAL_MAX_K:
        vec = F.col(vec_col).cast("array<double>")
        sims = [
            _dot(vec, F.lit([float(x) for x in c])) / _norm(vec)
            for c in centroids
        ]
        best = F.array_position(F.array(*sims), F.array_max(F.array(*sims))) - 1
        return embeddings.select(
            F.col(id_col), F.col(vec_col), best.cast("int").alias("ivf_cell")
        )

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    matrix = np.asarray(centroids, dtype=np.float64)  # (k, dim), rows unit-norm

    def _assign_batch(vecs):
        batch = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if batch.size == 0:
            return pd.Series([], dtype="int32")
        norms = np.linalg.norm(batch, axis=1, keepdims=True)
        batch = batch / np.clip(norms, 1e-12, None)
        return pd.Series((batch @ matrix.T).argmax(axis=1).astype("int32"))

    _assign_batch.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    assign = pandas_udf("int")(_assign_batch)

    return embeddings.select(
        F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("ivf_cell")
    )


def ivf_topk(
    embeddings: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    cell_col: str | None = None,
) -> DataFrame:
    """IVF search: brute-force rerank restricted to the ``n_probe`` cells
    nearest the query. Recall/cost dial = (n_cells, n_probe).

    ``cell_col``: name of a PRECOMPUTED cell column (``ivf_assign`` run
    once at ingest and stored — the at-scale shape, mirroring
    ``ann_topk_lsh(bucket_col=...)``): a query is then a cell IN-list
    filter + rerank, no assignment pass over the corpus. With a
    cell-partitioned/bucketed table the probe filter prunes partitions
    at the scan."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe_cells = np.argsort(-(centroids @ q))[:n_probe].tolist()
    if cell_col is not None:
        assigned = embeddings
    else:
        assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
        cell_col = "ivf_cell"
    cand = assigned.where(F.col(cell_col).isin(probe_cells)).select(id_col, vec_col)
    return cosine_topk(cand, query, k, id_col, vec_col, round_to)


# ── CosineStrategy: per-page chunk clustering ────────────────────────────


def _hashed_tf_vector(text: str, dim: int = 256) -> np.ndarray:
    """Deterministic hashed term-frequency embedding (unit norm).

    The reference's CosineStrategy embeds chunks with sentence-transformers
    (extraction_strategy.py:172-530); no model ships in this environment,
    so the embedding is swapped for feature-hashed TF vectors — a
    documented deviation. The clustering/filtering semantics downstream
    are the operator contract and are preserved.
    """
    import zlib

    vec = np.zeros(dim, dtype=np.float64)
    for tok in text.lower().split():
        tok = tok.strip(".,!?;:\"()[]{}")
        if len(tok) > 2:
            # crc32: process-stable (builtin hash() is PYTHONHASHSEED-
            # randomized per worker and would break driver/executor parity)
            vec[zlib.crc32(tok.encode()) % dim] += 1.0
    norm = np.linalg.norm(vec)
    return vec / norm if norm > 0 else vec


def _agglomerate(vectors: np.ndarray, max_dist: float) -> list[int]:
    """Average-linkage agglomerative clustering under cosine distance,
    stopping when the closest pair exceeds ``max_dist`` (the reference's
    ward/max_dist=0.2 semantics with cosine geometry). O(n³) worst case —
    per page n is tens of chunks, and pages parallelize embarrassingly."""
    n = len(vectors)
    clusters: dict[int, list[int]] = {i: [i] for i in range(n)}
    centers = {i: vectors[i].copy() for i in range(n)}
    while len(clusters) > 1:
        best, best_d = None, max_dist
        keys = sorted(clusters)
        for ii, a in enumerate(keys):
            for b in keys[ii + 1 :]:
                ca, cb = centers[a], centers[b]
                na, nb = np.linalg.norm(ca), np.linalg.norm(cb)
                sim = float(ca @ cb / (na * nb)) if na > 0 and nb > 0 else 0.0
                d = 1.0 - sim
                if d <= best_d:
                    best, best_d = (a, b), d
        if best is None:
            break
        a, b = best
        clusters[a].extend(clusters.pop(b))
        centers[a] = np.mean([vectors[i] for i in clusters[a]], axis=0)
        del centers[b]
    labels = [0] * n
    for label, members in enumerate(sorted(clusters.values(), key=min)):
        for m in members:
            labels[m] = label
    return labels


def cosine_cluster_chunks(
    docs: DataFrame,
    query: str | None = None,
    sim_threshold: float = 0.3,
    max_dist: float = 0.2,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-page semantic sectioning (CosineStrategy surface): split the
    text into sentence chunks, cluster similar chunks, emit one row per
    cluster with its concatenated text (document order); optionally keep
    only clusters whose centroid is within ``sim_threshold`` cosine
    similarity of ``query``. One Arrow pass per page batch."""
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    q_vec = _hashed_tf_vector(query, dim) if query else None

    def sections_of(text: str):
        sents = [s.strip() for s in _re.split(r"(?<=[.!?])\s+", text or "") if s.strip()]
        if not sents:
            return []
        vecs = np.asarray([_hashed_tf_vector(s, dim) for s in sents])
        labels = _agglomerate(vecs, max_dist)
        out = []
        for label in sorted(set(labels), key=labels.index):
            members = [i for i, l in enumerate(labels) if l == label]
            center = np.mean(vecs[members], axis=0)
            if q_vec is not None:
                norm = np.linalg.norm(center)
                sim = float(center @ q_vec / norm) if norm > 0 else 0.0
                if sim < sim_threshold:
                    continue
            out.append(" ".join(sents[i] for i in members))
        return out

    def _udf(text):
        return pd.Series([sections_of(t) for t in text])

    _udf.__annotations__ = {"text": pd.Series, "return": pd.Series}
    udf = pandas_udf("array<string>")(_udf)
    return docs.select(
        F.col(id_col), F.posexplode(udf(F.col(text_col))).alias("section_index", "section")
    )


def semantic_dedup_pairs(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Within-cell near-dup pairs (id_a < id_b, cosine ≥ threshold) over an
    ``ivf_assign`` output. The self-join carries the cell key, so candidate
    count is Σ|cell|²/2, not n²/2 — the SemDeDup decomposition (Abbas et
    al. 2023, public): pick k ≈ n / target_cell_size so per-cell work stays
    bounded as the corpus grows."""
    a = assigned.select(
        F.col("ivf_cell"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    b = assigned.select(
        F.col("ivf_cell"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.join(b, ["ivf_cell"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", F.round(sim, round_to))
        .where(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 16,
    threshold: float = 0.95,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means cells (coarse
    quantizer trained on a bounded deterministic sample), within-cell
    cosine pairs ≥ threshold, then the paper's upper-triangular drop rule:
    a row is dropped iff it has ANY smaller-id near-dup in its cell
    (whether or not that row itself survives). Keep-lowest-id is the same
    representative convention the exact-dedup and C4 span paths use, so
    "keep one per group" semantics agree across the dedup family; on
    chains (a~b, b~c, a≁c) this drops more than a connected-component
    representative would — use ``graph.connected_components`` over
    ``semantic_dedup_pairs`` when component-exact semantics matter.

    Returns the kept rows (original columns). Approximation vs all-pairs:
    near-dup pairs split across cell boundaries are not seen (recall of
    the cell decomposition is pinned by test against the exact all-pairs
    operator on clustered data).

    100 TB shape: train is O(sample) on the driver; assign is one map
    stage; the pair join shuffles by cell only; the drop set is a
    broadcast-sized anti-join when drops are rare (the common case for
    high thresholds) — no global sort, no driver loop over rows.
    """
    if centroids is None:
        centroids = kmeans_centroids(
            embeddings, k=k, seed=seed, vec_col=vec_col, id_col=id_col
        )
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    pairs = semantic_dedup_pairs(assigned, threshold, id_col, vec_col)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return embeddings.join(dropped, [id_col], "left_anti")
