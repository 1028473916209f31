"""Quality-classifier scoring at scale: fit once on the bounded sample,
then score N and 4N synthetic documents and report wall + throughput —
the linearity check for the distributed half of the GPT-3-style filter
(BENCH/CCNET.md documents the corpus generator; scoring is one gram
explode + one (doc, bucket) hash agg + one per-doc fold, map-only after
the aggregation, weights ride as a literal array).

Usage: python scripts/bench_qc.py [n_docs] [cpus]   (default 250000 8)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_ccnet import synth_corpus  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.quality_classifier import (
        fit_quality_classifier,
        pareto_select,
        score_quality,
    )
    from crawl4ai_spark.session import get_spark

    spark = get_spark(
        app_name="bench_qc", master=f"local[{cpus}]", shuffle_partitions=max(cpus * 2, 16)
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    # fit once on the bounded hash-ordered sample of the SMALL leg
    # (positive label: docs whose id-hash is even — a deterministic
    # stand-in; the bench measures scoring cost, not label quality)
    corpus = synth_corpus(spark, n)
    t0 = time.time()
    w, b = fit_quality_classifier(
        corpus, F.pmod(F.xxhash64("doc_id"), 2) == 0, n_buckets=512, sample=2000
    )
    fit_sec = round(time.time() - t0, 2)

    legs = []
    for n_docs in (n, 4 * n):
        c = synth_corpus(spark, n_docs)
        best = None
        for _ in range(3):
            t0 = time.time()
            pareto_select(score_quality(c, w, b)).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        kept = pareto_select(score_quality(c, w, b)).agg(F.sum("keep")).first()[0]
        legs.append(
            {
                "n_docs": n_docs,
                "wall_sec_min3": round(best, 2),
                "docs_per_sec": round(n_docs / best, 1),
                "kept": int(kept),
                "kept_frac": round(kept / n_docs, 4),
            }
        )
    spark.stop()
    growth = legs[1]["wall_sec_min3"] / legs[0]["wall_sec_min3"]
    print(
        json.dumps(
            {
                "metric": "quality_classifier_scoring_scale",
                "cpus": cpus,
                "fit_sec_bounded_sample": fit_sec,
                "legs": legs,
                "wall_growth_at_4x_docs": round(growth, 2),
                "linear_or_better": growth <= 4.0,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
