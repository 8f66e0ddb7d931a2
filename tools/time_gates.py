#!/usr/bin/env python3
"""Time named gates in isolation with the noop sink (guide §1.4).

Usage:
    python3 tools/time_gates.py gate1,gate2,... [--runs 3] [--out file.json]

Per gate: one warm-up at the smallest SF that exists (JIT/codegen), then
--runs timed noop-sink executions at $SPARK_GRAFT_SF_DIR (default sf0.1),
best-of reported. The noop sink computes every column of every row, so the
measurement covers the full computation without driver-side row transfer
(bench.py's count() can let the optimizer prune; this tool is the
per-operator isolation instrument, bench.py stays the driver contract).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    runs = 3
    out_path = None
    argv = sys.argv[2:]
    while argv:
        a = argv.pop(0)
        if a == "--runs":
            runs = int(argv.pop(0))
        elif a == "--out":
            out_path = argv.pop(0)

    import __spark_entry__ as entry_mod
    from bqetl_spark.caching import release_pinned
    from bqetl_spark.session import get_spark, tune_shuffle_partitions

    spark = get_spark("bqetl_spark_time")
    tune_shuffle_partitions(spark, SF_DIR)
    qs = entry_mod.queries()

    warm_dir = SF_DIR
    for cand in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        if os.path.isdir(cand):
            warm_dir = cand
            break

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    res: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        noop(fn(spark, warm_dir))
        release_pinned()
        best = float("inf")
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"time:{name}#{i}")
            t0 = time.perf_counter()
            noop(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
            release_pinned()
        res[name] = round(best, 3)
        print(f"{name}: {res[name]}s", flush=True)

    line = json.dumps({"sf": SF_DIR, "runs": runs, "noop": True,
                       "gates": res})
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
