"""CCNet pipeline scale evidence: run ccnet_pipeline over deterministic
synthetic multi-paragraph corpora at two sizes (N and 4N) and report wall,
throughput, and reduction tallies — the no-super-linear-growth check for
the paragraph-dedup + LM-bucketing pipeline (BENCH/CCNET.md).

The corpus is generated IN Spark (no driver materialization, no external
data): 7 paragraphs x 8 words per doc from a 100-word vocabulary, with
~1/4 of paragraphs drawn from a shared 64-paragraph boilerplate pool
(cookie-banner analogue — gives the dedup stage real cross-doc work) and
the rest salted by (doc_id, para). Everything is a pure function of
doc_id via xxhash64, so any run at any parallelism builds the same corpus.

Usage: python scripts/bench_ccnet.py [n_docs] [cpus]   (default 100000 8)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [
    f"{a}{b}" for a in ("mar", "tel", "sor", "ban", "cul", "rid", "pon", "ves", "lum", "tor")
    for b in ("aka", "eli", "ito", "ona", "ura", "emi", "ost", "ind", "alo", "eve")
]
# fold in English panel stopwords so the language gate passes (they ride
# the same hash-indexed slots; 'the'/'and'/'for'/'with' are > 2 chars so
# they are LM-visible too, like real text)
VOCAB[::12] = ["the", "and", "for", "with", "that", "this", "from", "have", "were"][
    : len(VOCAB[::12])
]


def synth_corpus(spark, n_docs: int):
    """(doc_id, text) with newline-separated paragraphs, built by one
    selectExpr (single analysis pass, zero Python rows)."""
    vocab_sql = "array(" + ", ".join(f"'{w}'" for w in VOCAB) + ")"
    # a paragraph = 8 vocab words indexed by xxhash64(seed, k); shared
    # pool paragraphs use seed = a pool id (collides across docs), unique
    # paragraphs use seed = doc_id * 7 + p (collides nowhere)
    word = (
        f"element_at({vocab_sql}, 1 + CAST(pmod(xxhash64("
        "CASE WHEN pmod(xxhash64(id, p), 4) = 0 "
        "     THEN 9000000000 + pmod(xxhash64(id, p, 1), 64) "
        "     ELSE id * 7 + p END, k), 100) AS INT))"
    )
    text = (
        "array_join(transform(sequence(0, 6), p -> "
        f"array_join(transform(sequence(0, 7), k -> {word}), ' ')"
        "), '\\n') AS text"
    )
    return spark.range(n_docs).selectExpr("id AS doc_id", text)


def run_leg(n_docs: int, cpus: int) -> dict:
    from crawl4ai_spark.operators.ccnet import ccnet_pipeline
    from crawl4ai_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_ccnet_{n_docs}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    corpus = synth_corpus(spark, n_docs)
    best = None
    for _ in range(3):
        t0 = time.time()
        ccnet_pipeline(corpus).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out = ccnet_pipeline(corpus)
    from pyspark.sql import functions as F

    tally = out.agg(
        F.count("*").alias("survivors"),
        F.sum("n_paras_total").alias("paras_total"),
        F.sum("n_paras_kept").alias("paras_kept"),
        F.sum(F.when(F.col("ppl_bucket") == "head", 1).otherwise(0)).alias("head"),
    ).first()
    spark.stop()
    return {
        "n_docs": n_docs,
        "cpus": cpus,
        "wall_sec_min3": round(best, 2),
        "docs_per_sec": round(n_docs / best, 1),
        "survivors": tally["survivors"],
        "paras_total": int(tally["paras_total"]),
        "paras_kept": int(tally["paras_kept"]),
        "dedup_removed_frac": round(1 - tally["paras_kept"] / tally["paras_total"], 4),
        "head_docs": tally["head"],
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    legs = [run_leg(n, cpus), run_leg(4 * n, cpus)]
    growth = legs[1]["wall_sec_min3"] / legs[0]["wall_sec_min3"]
    print(json.dumps({
        "metric": "ccnet_pipeline_scale",
        "legs": legs,
        "wall_growth_at_4x_docs": round(growth, 2),
        "linear_or_better": growth <= 4.0,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
