#!/usr/bin/env python3
"""Same-session A/B: tune_shuffle_partitions (input-stats reducer sizing)
vs fixed 32, interleaved per query so box noise hits both arms equally.

Round-5 verdict finding #2: the sf0.1 headline total regressed 9.46 ->
12.47 s after tune_shuffle_partitions was wired into bench.py; this script
decides whether the heuristic or environment drift is the cause.

Prints one JSON line: {"fixed32": {...}, "tuned": {...}, "tuned_n": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "denorm_flat", "q1_pricing_summary", "q3_top_revenue",
    "q5_region_revenue", "window_running_total", "nest_orders",
    "sessionize", "asof_purchase", "range_join_bands", "dedup_fingerprint",
    "minhash_lsh", "ngram_jaccard", "winnow_neardup", "embed_topk",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from bqetl_spark.caching import release_pinned
    from bqetl_spark.session import get_spark, tune_shuffle_partitions

    spark = get_spark("ab_shuffle")
    tuned_n = tune_shuffle_partitions(spark, SF_DIR)
    qs = entry_mod.queries()

    # warm-up at the smallest SF (JIT/codegen outside timed region)
    warm = "/root/testdata/sf0.001"
    for name in HEADLINE:
        qs[name](spark, warm if os.path.isdir(warm) else SF_DIR).count()

    arms = {"fixed32": "32", "tuned": str(tuned_n)}
    out: dict[str, dict[str, float]] = {a: {} for a in arms}
    for name in HEADLINE:
        for arm, n in arms.items():
            spark.conf.set("spark.sql.shuffle.partitions", n)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).count()
                best = min(best, time.perf_counter() - t0)
            out[arm][name] = round(best, 3)
            release_pinned()
    res = {"tuned_n": tuned_n}
    for arm in arms:
        res[arm] = {"queries": out[arm],
                    "total": round(sum(out[arm].values()), 3)}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
