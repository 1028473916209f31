"""Embedding-family scale evidence (BENCH/EMBEDDINGS.md): ANN recall@10
vs full brute force and planted-pair near-dup recall at 10^5 and 10^6
synthetic vectors.

The sf0.01 oracle rows pin CORRECTNESS on 500 vectors; this leg pins the
SCALE story: recall holds at the documented (planes, probes)/(bands,
planes) settings and wall time grows ~linearly 10^5 -> 10^6 (bucketed
candidate generation, never all-pairs).

Data (deterministic, generated distributed via mapInPandas — no driver
materialization, no external data):
  - ANN leg: C = N/1000 tight clusters (unit centroid + 0.08-scale hash
    noise, dim 64). Queries are 5 centroids + small noise; exact top-10
    by full-scan cosine; approximate via multi-probe hyperplane LSH over
    a PRECOMPUTED bucket column (the at-scale shape: signatures stored
    at ingest, query = bucket filter + candidate rerank).
  - near-dup leg: loose clusters (0.6-scale noise -> non-planted cosine
    ~0.1) with ids 100m+1 planted as near-copies of 100m (cosine
    ~0.9995): recall = planted pairs found / planted, precision 1 by
    construction (exact verification inside the operator).

Noise is frac(sin(...)*43758.5453) per (base_id, dim) — fully
deterministic, vectorized, partition-independent.

Usage: python scripts/bench_embeddings.py [N ...]   (default 100000 1000000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N_PLANES = 10
PROBE_HAMMING = 3
# near-dup banding tuned for the near-exact-duplicate regime (cosine
# ≥ ~0.99, the dedup use case): 20 planes/band keeps a RANDOM 64-dim
# pair's band-collision probability at ~2^-20 (expected candidates
# ~N²·bands/2^21 — sub-quadratic in practice because real corpora are
# cluster-skewed, and the planted pairs still collide in ≥1 of 8 bands
# w.p. ~1-2e-6). The operator's 8-plane default is the S-curve knee for
# threshold~0.9 corpora where near-dups dominate; this leg measures the
# random-heavy worst case, where coarse bands would go quadratic.
BANDS = 8
PLANES_PER_BAND = 20
THRESHOLD = 0.9
K = 10
SEED = 42


def _hash_noise(ids: np.ndarray, salt: float) -> np.ndarray:
    """(len(ids), DIM) deterministic pseudo-noise in [-1, 1)."""
    j = np.arange(DIM, dtype=np.float64)[None, :]
    x = ids.astype(np.float64)[:, None]
    v = np.sin(x * 12.9898 + j * 78.233 + salt) * 43758.5453
    return (v - np.floor(v)) * 2.0 - 1.0


def _centroids(n_clusters: int) -> np.ndarray:
    rng = np.random.RandomState(SEED)
    c = rng.standard_normal((n_clusters, DIM))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def make_table(spark, n: int, sigma: float, n_clusters: int, plant: bool, path: str):
    """Write (vec_id, embedding) parquet, generated distributed."""
    cents = _centroids(n_clusters)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            planted = (ids % 100 == 1) if plant else np.zeros(len(ids), bool)
            base = np.where(planted, ids - 1, ids)
            cl = (base % n_clusters).astype(int)
            vec = cents[cl] + sigma * _hash_noise(base, 0.0)
            if plant:
                vec = vec + 0.02 * _hash_noise(ids, 7.31) * planted[:, None]
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.tolist() for r in vec]}
            )

    df = spark.range(n).mapInPandas(gen, "vec_id long, embedding array<double>")
    df.write.mode("overwrite").parquet(path)


def ann_leg(spark, n: int, workdir: str) -> dict:
    from crawl4ai_spark.operators.similarity import (
        ann_topk_lsh,
        cosine_topk,
        hyperplane_signatures,
    )

    n_clusters = max(n // 1000, 16)
    raw = os.path.join(workdir, f"ann_{n}")
    make_table(spark, n, 0.08, n_clusters, False, raw)
    emb = spark.read.parquet(raw)
    # at-scale shape: signatures precomputed once at ingest
    sig_path = os.path.join(workdir, f"ann_sig_{n}")
    t0 = time.time()
    hyperplane_signatures(emb, DIM, N_PLANES, SEED).write.mode("overwrite").parquet(
        sig_path
    )
    t_ingest = time.time() - t0
    sigs = spark.read.parquet(sig_path)

    # the CLUSTER layout: signature store partitionBy(bucket), so the
    # probe IN list prunes whole directories before any row is read
    from crawl4ai_spark.operators.similarity import probe_buckets

    part_path = os.path.join(workdir, f"ann_sig_part_{n}")
    t0 = time.time()
    sigs.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(part_path)
    t_part_ingest = time.time() - t0
    psigs = spark.read.parquet(part_path)
    n_dirs = len(
        [d for d in os.listdir(part_path) if d.startswith("bucket=")]
    )

    cents = _centroids(n_clusters)
    rng = np.random.RandomState(SEED + 1)
    recalls, t_ann, t_exact, t_part = [], 0.0, 0.0, 0.0
    dirs_read = []
    for qi in range(5):
        q = (cents[qi] + 0.05 * rng.standard_normal(DIM)).tolist()
        t0 = time.time()
        exact = {
            r.vec_id
            for r in cosine_topk(emb, q, K).collect()
        }
        t_exact += time.time() - t0
        t0 = time.time()
        approx = {
            r.vec_id
            for r in ann_topk_lsh(
                sigs, q, K, N_PLANES, SEED,
                probe_hamming=PROBE_HAMMING, bucket_col="bucket",
            ).collect()
        }
        t_ann += time.time() - t0
        t0 = time.time()
        approx_part = {
            r.vec_id
            for r in ann_topk_lsh(
                psigs, q, K, N_PLANES, SEED,
                probe_hamming=PROBE_HAMMING, bucket_col="bucket",
            ).collect()
        }
        t_part += time.time() - t0
        assert approx_part == approx, "partitioned layout changed the result"
        probed = set(probe_buckets(q, N_PLANES, SEED, PROBE_HAMMING))
        dirs_read.append(
            len([d for d in os.listdir(part_path)
                 if d.startswith("bucket=") and int(d.split("=")[1]) in probed])
        )
        recalls.append(len(exact & approx) / K)
    return {
        "n": n,
        "recall_at_10": round(float(np.mean(recalls)), 4),
        "recalls": recalls,
        "ann_sec_per_query": round(t_ann / 5, 3),
        "ann_partitioned_sec_per_query": round(t_part / 5, 3),
        "exact_sec_per_query": round(t_exact / 5, 3),
        "signature_ingest_sec": round(t_ingest, 3),
        "partitioned_ingest_sec": round(t_part_ingest, 3),
        "bucket_dirs_total": n_dirs,
        "bucket_dirs_read_per_query": dirs_read,
        "n_planes": N_PLANES,
        "probe_hamming": PROBE_HAMMING,
    }


IVF_K = 64
IVF_PROBE = 8


def ivf_leg(spark, n: int, workdir: str) -> dict:
    """IVF coarse-quantizer search at scale: centroids train on a bounded
    deterministic sample, cells are assigned ONCE at ingest and stored
    (the at-scale shape — ``ivf_topk(cell_col=...)``), a query probes the
    IVF_PROBE nearest cells and reranks."""
    from crawl4ai_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
        kmeans_centroids,
    )

    n_clusters = max(n // 1000, 16)
    raw = os.path.join(workdir, f"ann_{n}")  # reuse the ANN leg's table
    if not os.path.exists(raw):
        make_table(spark, n, 0.08, n_clusters, False, raw)
    emb = spark.read.parquet(raw)
    t0 = time.time()
    cents = kmeans_centroids(emb, k=IVF_K, iters=5, sample=10_000, seed=SEED)
    t_train = time.time() - t0
    cell_path = os.path.join(workdir, f"ivf_cells_{n}")
    t0 = time.time()
    ivf_assign(emb, cents).write.mode("overwrite").parquet(cell_path)
    t_ingest = time.time() - t0
    assigned = spark.read.parquet(cell_path)

    true_cents = _centroids(n_clusters)
    rng = np.random.RandomState(SEED + 2)
    recalls, t_ivf, t_exact = [], 0.0, 0.0
    for qi in range(5):
        q = (true_cents[qi] + 0.05 * rng.standard_normal(DIM)).tolist()
        t0 = time.time()
        exact = {r.vec_id for r in cosine_topk(emb, q, K).collect()}
        t_exact += time.time() - t0
        t0 = time.time()
        approx = {
            r.vec_id
            for r in ivf_topk(
                assigned, q, cents, K, n_probe=IVF_PROBE, cell_col="ivf_cell"
            ).collect()
        }
        t_ivf += time.time() - t0
        recalls.append(len(exact & approx) / K)
    return {
        "n": n,
        "recall_at_10": round(float(np.mean(recalls)), 4),
        "recalls": recalls,
        "ivf_sec_per_query": round(t_ivf / 5, 3),
        "exact_sec_per_query": round(t_exact / 5, 3),
        "train_sec": round(t_train, 3),
        "cell_ingest_sec": round(t_ingest, 3),
        "k_centroids": IVF_K,
        "n_probe": IVF_PROBE,
    }


def neardup_leg(spark, n: int, workdir: str) -> dict:
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.similarity import cosine_neardup_lsh_pairs

    raw = os.path.join(workdir, f"nd_{n}")
    make_table(spark, n, 0.6, max(n // 1000, 16), True, raw)
    emb = spark.read.parquet(raw)
    n_planted = len([i for i in range(n) if i % 100 == 1])
    t0 = time.time()
    pairs = cosine_neardup_lsh_pairs(
        emb, THRESHOLD, DIM, BANDS, PLANES_PER_BAND, SEED,
        max_bucket_size=5000,
    )
    found_planted = pairs.where(
        (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_a") % 100 == 0)
    ).count()
    wall = time.time() - t0
    total = pairs.count()
    return {
        "n": n,
        "planted_pairs": n_planted,
        "found_planted": found_planted,
        "recall_planted": round(found_planted / n_planted, 4),
        "total_pairs_found": total,
        "wall_sec": round(wall, 3),
        "bands": BANDS,
        "planes_per_band": PLANES_PER_BAND,
        "threshold": THRESHOLD,
    }


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    from crawl4ai_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_embeddings",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    out = {"dim": DIM, "cpus": int(cpus), "ann": [], "ivf": [], "neardup": []}
    with tempfile.TemporaryDirectory(dir="/tmp") as workdir:
        for n in sizes:
            out["ann"].append(ann_leg(spark, n, workdir))
            print(json.dumps({"leg": "ann", **out["ann"][-1]}), flush=True)
            out["ivf"].append(ivf_leg(spark, n, workdir))
            print(json.dumps({"leg": "ivf", **out["ivf"][-1]}), flush=True)
            out["neardup"].append(neardup_leg(spark, n, workdir))
            print(json.dumps({"leg": "neardup", **out["neardup"][-1]}), flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
