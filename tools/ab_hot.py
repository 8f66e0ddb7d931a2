#!/usr/bin/env python3
"""Alternating same-session A/B: current ckpt() vs hot_ckpt() (persist
+ checkpoint) across the expensive extras, under the BENCH protocol
(3 reps per measurement, release_pinned() after — reps share caches,
exactly how bench.py and the driver measure).

The perceptron root-cause (PLANS.md r13) showed a bare localCheckpoint
is never reused across invocations while a persisted plan cache-hits
via the CacheManager; this sweep measures which ckpt()-based gates
benefit from the combined shape before any call site is changed.

Usage: cd /tmp && python3 /root/repo/tools/ab_hot.py [PASSES] [OUT]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 2
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    ROOT, "BENCH_AB_HOT_r13.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

GATES = os.environ.get("BQETL_AB_GATES", "").split(",") if \
    os.environ.get("BQETL_AB_GATES") else [
    "token_embed_topk", "doc_embed_topk", "doc_embed_ann",
    "wordpiece_train", "wordpiece_segments", "triangle_count",
    "embed_ivfpq_topk", "quality_trained", "kcore_parts",
    "ngram_novelty", "sssp_hops", "minhash_lsh",
    "unigram_fertility", "lm_greedy_decode", "retrieval_eval",
]
REPS = 3


def main() -> None:
    import __spark_entry__ as em
    from bqetl_spark import caching
    from bqetl_spark.caching import release_pinned
    from bqetl_spark.session import get_spark, tune_shuffle_partitions

    spark = get_spark("bqetl_spark_ab_hot",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    tune_shuffle_partitions(spark, SF_DIR)
    qs = em.queries()

    real_ckpt = caching.ckpt
    variants = {"ckpt": real_ckpt,
                "hot": lambda df: real_ckpt(caching.pin(df))}

    for g in GATES:  # one warm pass for codegen/JIT
        qs[g](spark, SF_DIR).count()
        release_pinned()
    print("WARM done", flush=True)

    samples: dict[str, dict[str, list[float]]] = {
        g: {v: [] for v in variants} for g in GATES}
    for p in range(PASSES):
        for vname, fn in variants.items():
            caching.ckpt = fn
            for g in GATES:
                spark.sparkContext.setJobDescription(f"ab_hot {g} {vname}")
                best = float("inf")
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    qs[g](spark, SF_DIR).count()
                    best = min(best, time.perf_counter() - t0)
                release_pinned()
                samples[g][vname].append(round(best, 3))
        print(f"pass {p}: " + json.dumps(
            {g: {v: samples[g][v][-1] for v in variants} for g in GATES}),
            flush=True)
    caching.ckpt = real_ckpt

    summary = {}
    for g in GATES:
        med = {v: statistics.median(samples[g][v]) for v in variants}
        summary[g] = {"samples": samples[g], "median_best": med,
                      "hot_over_ckpt": round(med["hot"] / med["ckpt"], 3)}
    with open(OUT, "w") as f:
        json.dump({"protocol": "bench best-of-3 per measurement, "
                               "release after; alternating variants",
                   "sf": SF_DIR, "passes": PASSES,
                   "gates": summary}, f, indent=1)
    print("wrote", OUT)
    for g in GATES:
        print(g, summary[g]["median_best"], "hot/ckpt =",
              summary[g]["hot_over_ckpt"])
    spark.stop()


if __name__ == "__main__":
    main()
