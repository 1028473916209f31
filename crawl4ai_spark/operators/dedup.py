"""Deduplication operators for web-scale training-data pipelines.

Exact + near-duplicate detection over a ``documents(doc_id, text)`` table:

- **exact**: hash-groupBy on content digest (one shuffle, map-side
  partial agg).
- **n-gram Jaccard (exact)**: shingle explode → inverted-index self-join →
  pair intersection counts → |A∩B| / (|A|+|B|−|A∩B|). Quadratic only
  within shingle buckets; the join key (shingle) is the pre-filter.
- **MinHash + LSH (approximate)**: numpy-vectorized signatures (k
  universal-hash permutations over shingle hashes), banded into buckets,
  bucket-join for candidates, exact-Jaccard verification of candidates
  only. The 100 TB path: candidate generation is linear in corpus size.
- **SimHash**: 64-bit fingerprint + banding on 16-bit chunks for hamming-
  distance candidate pairs.

All pair outputs are canonicalized to ``id_a < id_b`` and deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from crawl4ai_spark.operators.textstats import clean_terms_col

# ── exact ────────────────────────────────────────────────────────────────


def exact_duplicate_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical documents: (content_md5, n_dups, doc_ids)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.count("*").alias("n_dups"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("n_dups") > 1)
    )


def dedup_keep_first(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative of each exact-duplicate class."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return docs.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


# ── shingles ─────────────────────────────────────────────────────────────


def shingles_col(text_col, n: int = 3):
    """Word n-gram shingles as strings (distinct per doc)."""
    toks = clean_terms_col(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array())
    )


def shingle_table(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles_col(F.col(text_col), n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs ≥ threshold.

    Inverted-index join: only documents sharing ≥1 shingle are compared —
    the classic exact set-similarity-join baseline (cf. PAPERS.md
    distributed set-similarity-join line of work).
    """
    sh = shingle_table(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("set_size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("set_size", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ── MinHash + LSH ────────────────────────────────────────────────────────

_MERSENNE_P = np.uint64((1 << 61) - 1)


def _minhash_params(k: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=k, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=k, dtype=np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, signature array<long>[k]) via numpy universal hashing.

    Permutation i: h_i(x) = (a_i·x + b_i) mod (2^61−1); x = blake2b-64 of
    the shingle — deterministic across runs and partitions.
    """
    a_params, b_params = _minhash_params(k, seed)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("signature", ArrayType(LongType()))]
    )

    def sig(pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        rows = []
        for doc_id, sh_list in zip(pdf["doc_id"], pdf["shingles"]):
            if sh_list is None or len(sh_list) == 0:
                rows.append((doc_id, [0] * k))
                continue
            xs = np.fromiter(
                (
                    int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
                    for s in sh_list
                ),
                dtype=np.uint64,
                count=len(sh_list),
            )
            # (a*x + b) mod p, vectorized over (k, n_shingles)
            prod = (a_params[:, None] * xs[None, :] + b_params[:, None]) % _MERSENNE_P
            rows.append((doc_id, prod.min(axis=1).astype(np.int64).tolist()))
        return pd.DataFrame(rows, columns=["doc_id", "signature"])

    base = docs.select(
        F.col(id_col).alias("doc_id"), shingles_col(F.col(text_col), n).alias("shingles")
    )
    return base.mapInPandas(lambda it: (sig(pdf) for pdf in it), schema)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    verify_exact: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, optionally verified
    with exact Jaccard (candidates only — the scale-friendly path)."""
    assert k % bands == 0
    rows_per_band = k // bands
    sigs = minhash_signatures(docs, id_col, text_col, n, k, seed)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.concat_ws("_", F.lit(b), *[
                        F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)
                    ]))
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    if not verify_exact:
        return candidates
    sh = shingle_table(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    # exact-verify candidates only: intersection via join on (pair, shingle)
    inter = (
        candidates.join(sh.withColumnRenamed("doc_id", "id_a"), "id_a")
        .join(
            sh.selectExpr("doc_id as id_b", "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.selectExpr("doc_id as id_a", "set_size as size_a"), "id_a")
        .join(sizes.selectExpr("doc_id as id_b", "set_size as size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ── SimHash ──────────────────────────────────────────────────────────────


def simhash_candidate_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup candidates by SimHash banding (4×16-bit chunks ⇒ any pair
    within hamming distance 3 shares ≥1 exact chunk — pigeonhole)."""
    from crawl4ai_spark.operators.textstats import udf_simhash64

    sigs = docs.select(F.col(id_col).alias("doc_id"), udf_simhash64(F.col(text_col)).alias("simhash"))
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)) for i in range(4)])
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.withColumn("hamming", hamming).where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
