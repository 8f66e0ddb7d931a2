#!/usr/bin/env python3
"""Alternating same-session A/B: eager-localCheckpoint vs persist for
the r12 pin→ckpt conversions the driver read slower (VERDICT r12 item
4: sssp_hops 0.69×, wordpiece_train/segments 0.74×/0.80×, plus the
ambient-band headline pair minhash_lsh / ngram_jaccard).

Mechanism: every converted site calls ``bqetl_spark.caching.ckpt`` via
a call-time import, so monkeypatching the module attribute to a
pin-equivalent reproduces the r11 persist shape on the SAME tree inside
ONE session — both variants sample the same machine weather,
alternating per pass (the BENCH_AB_SHUFFLE_r06 discipline).

Usage: cd /tmp && python3 /root/repo/tools/ab_ckpt.py [PASSES] [OUT]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 5
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    ROOT, "BENCH_AB_CKPT_r13.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

GATES = ["sssp_hops", "wordpiece_train", "wordpiece_segments",
         "minhash_lsh", "ngram_jaccard"]


def main() -> None:
    import __spark_entry__ as em
    from bqetl_spark import caching
    from bqetl_spark.caching import release_pinned
    from bqetl_spark.session import get_spark, tune_shuffle_partitions

    spark = get_spark("bqetl_spark_ab_ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    tune_shuffle_partitions(spark, SF_DIR)
    qs = em.queries()

    real_ckpt = caching.ckpt

    def ckpt_as_pin(df):
        return caching.pin(df)

    variants = {"ckpt": real_ckpt, "pin": ckpt_as_pin}

    # warm both variants once (codegen/JIT out of the timed region)
    for vname, fn in variants.items():
        caching.ckpt = fn
        for g in GATES:
            qs[g](spark, SF_DIR).count()
            release_pinned()
        print(f"WARM {vname}", flush=True)

    samples: dict[str, dict[str, list[float]]] = {
        g: {v: [] for v in variants} for g in GATES}
    for p in range(PASSES):
        for vname, fn in variants.items():
            caching.ckpt = fn
            for g in GATES:
                spark.sparkContext.setJobDescription(f"ab_ckpt {g} {vname}")
                t0 = time.perf_counter()
                qs[g](spark, SF_DIR).count()
                samples[g][vname].append(
                    round(time.perf_counter() - t0, 3))
                release_pinned()
        print(f"pass {p}: " + json.dumps(
            {g: {v: samples[g][v][-1] for v in variants} for g in GATES}),
            flush=True)
    caching.ckpt = real_ckpt

    summary = {}
    for g in GATES:
        med = {v: statistics.median(samples[g][v]) for v in variants}
        summary[g] = {
            "samples": samples[g],
            "median": med,
            "best": {v: min(samples[g][v]) for v in variants},
            "ckpt_over_pin_median": round(med["ckpt"] / med["pin"], 3),
        }
    result = {"protocol": "alternating per-pass variant sweep in one "
                          "session; ckpt monkeypatched to persist for "
                          "the pin variant",
              "sf": SF_DIR, "passes": PASSES, "gates": summary}
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", OUT)
    for g in GATES:
        print(g, summary[g]["median"], "ckpt/pin =",
              summary[g]["ckpt_over_pin_median"])
    spark.stop()


if __name__ == "__main__":
    main()
