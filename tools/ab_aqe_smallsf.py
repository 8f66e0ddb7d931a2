#!/usr/bin/env python3
"""Config experiments for the q1/q3/q5 small-SF outliers (r5 verdict #7).

Measured root cause (PLANS.md r5): wall time is linear in AQE query-stage
count — each adaptive stage pays a ~100-160 ms driver-side launch floor in
local mode, constant in data size. Candidate mitigations tried here, one
session, interleaved best-of-3 per query per arm:

  A baseline        — session defaults (AQE on) + tuned reducers
  B minpart16m      — adaptive.coalescePartitions.minPartitionSize=16m
                      (fewer, larger coalesced partitions per stage)
  C advisory64m     — advisoryPartitionSizeInBytes=64m + parallelismFirst
                      =false (the r5 experiment, rechecked on TPC-H only)
  D aqe_off         — AQE disabled (static planner; the floor-check)

Prints one JSON line {"arms": {...}, "queries": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["q1_pricing_summary", "q3_top_revenue", "q5_region_revenue"]

ARMS = {
    "baseline": {},
    "minpart16m": {
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16m"},
    "advisory64m": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false"},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
}
_DEFAULTS = {
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
    "spark.sql.adaptive.enabled": "true",
}


def main() -> None:
    import __spark_entry__ as entry_mod
    from bqetl_spark.session import get_spark, tune_shuffle_partitions

    spark = get_spark("ab_aqe")
    tune_shuffle_partitions(spark, SF_DIR)
    qs = entry_mod.queries()
    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = SF_DIR
    for name in QUERIES:                       # warm shapes
        qs[name](spark, warm).count()

    out: dict[str, dict[str, float]] = {a: {} for a in ARMS}
    for name in QUERIES:
        for arm, conf in ARMS.items():
            for k, v in _DEFAULTS.items():
                spark.conf.set(k, conf.get(k, v))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).count()
                best = min(best, time.perf_counter() - t0)
            out[arm][name] = round(best, 3)
    for k, v in _DEFAULTS.items():
        spark.conf.set(k, v)
    print(json.dumps({"arms": {a: {"queries": q,
                                   "total": round(sum(q.values()), 3)}
                               for a, q in out.items()}}))


if __name__ == "__main__":
    main()
