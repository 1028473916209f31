"""Sharded bloom filter for the URL-seen set.

The reference prototypes exactly this (``crawl4ai/deep_crawling/crazy.py:
102-165``: BloomFilter with the optimal m = -n·ln p / ln²2 and
k = (m/n)·ln 2 sizing formulas). Distributed design:

- fingerprints are Spark-native ``xxhash64(url)`` (int64);
- the filter is **sharded by** ``shard_id = pmod(url_fp, n_shards)`` so
  each shard covers a disjoint key range and is built independently with
  one ``applyInPandas`` group — numpy-vectorized, no per-row Python;
- per crawl wave we append a new *generation* of shards for that wave's
  newly-seen fingerprints (append-only, checkpoint-friendly — no
  read-modify-write of a global filter);
- membership check is a **cogroup** of candidates × shard generations on
  shard_id: a candidate is ``maybe_seen`` if ANY generation hits.

Correctness: the bloom is only a pre-filter (false positives routed to the
exact anti-join; false negatives impossible), mirroring SURVEY.md §4.2.
At 10^10 URLs with fpp=1%: m ≈ 9.6 bits/URL ≈ 12 GB total across shards —
far too big for one broadcast but fine as ~1200 × 10 MB cogrouped shards.

Hash scheme: double hashing pos_i = h1 + i·h2 (mod m) over uint64, with
h2 a splitmix64 finalizer of the fingerprint — standard Kirsch-Mitzenmacher
construction.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SHARD_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType()),
        StructField("n_items", LongType()),
        StructField("m_bits", LongType()),
        StructField("k_hashes", IntegerType()),
        StructField("bitset", BinaryType()),
    ]
)

_SPLITMIX_MUL1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_MUL2 = np.uint64(0x94D049BB133111EB)


def _h1_h2(fps: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams from int64 fingerprints."""
    x = fps.astype(np.uint64)
    h1 = x
    # splitmix64 finalizer for the second stream
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_MUL1
    z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_MUL2
    h2 = z ^ (z >> np.uint64(31))
    h2 = h2 | np.uint64(1)  # odd → full period mod m
    return h1, h2


def optimal_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for n items at false-positive rate fpp."""
    n_items = max(n_items, 1)
    m = max(64, int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n_items * math.log(2))))
    return m, k


def _build_bitset(fps: np.ndarray, m_bits: int, k: int) -> bytes:
    bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    h1, h2 = _h1_h2(fps)
    m = np.uint64(m_bits)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64), (1 << (pos & np.uint64(7))).astype(np.uint8))
    return bits.tobytes()


def _contains(fps: np.ndarray, m_bits: int, k: int, bitset: bytes) -> np.ndarray:
    bits = np.frombuffer(bitset, dtype=np.uint8)
    h1, h2 = _h1_h2(fps)
    m = np.uint64(m_bits)
    hit = np.ones(len(fps), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        hit &= (bits[(pos >> np.uint64(3)).astype(np.int64)] & (1 << (pos & np.uint64(7))).astype(np.uint8)) != 0
    return hit


def shard_id_col(fp_col, n_shards: int):
    return F.pmod(fp_col, F.lit(n_shards)).cast("int")


def build_bloom_shards(
    seen_delta: DataFrame, n_shards: int = 32, fpp: float = 0.01, fp_col: str = "url_fp"
) -> DataFrame:
    """Build one generation of bloom shards from newly-seen fingerprints."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        fps = pdf[fp_col].to_numpy(dtype=np.int64)
        m_bits, k = optimal_params(len(fps), fpp)
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "n_items": [len(fps)],
                "m_bits": [m_bits],
                "k_hashes": [k],
                "bitset": [_build_bitset(fps, m_bits, k)],
            }
        )

    return (
        seen_delta.select(fp_col)
        .withColumn("shard_id", shard_id_col(F.col(fp_col), n_shards))
        .groupBy("shard_id")
        .applyInPandas(build, SHARD_SCHEMA)
    )


def bloom_prefilter(
    candidates: DataFrame,
    shards: DataFrame,
    n_shards: int = 32,
    fp_col: str = "url_fp",
) -> DataFrame:
    """Tag candidates with ``maybe_seen`` by cogrouping against shard
    generations. maybe_seen=False ⇒ definitely new (skip exact anti-join);
    maybe_seen=True ⇒ must still pass the exact anti-join."""
    from pyspark.sql.types import BooleanType

    out_schema = StructType(candidates.schema.fields + [StructField("maybe_seen", BooleanType())])
    cand_cols = [f.name for f in candidates.schema.fields]

    def check(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame(columns=cand_cols + ["maybe_seen"])
        fps = cand_pdf[fp_col].to_numpy(dtype=np.int64)
        maybe = np.zeros(len(fps), dtype=bool)
        for _, gen in shard_pdf.iterrows():
            maybe |= _contains(fps, int(gen["m_bits"]), int(gen["k_hashes"]), gen["bitset"])
        out = cand_pdf[cand_cols].copy()
        out["maybe_seen"] = maybe
        return out

    tagged = (
        candidates.withColumn("shard_id", shard_id_col(F.col(fp_col), n_shards))
        .groupBy("shard_id")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(check, out_schema)
    )
    return tagged
