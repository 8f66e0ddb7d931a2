#!/usr/bin/env python3
"""Capture .explain("formatted") for named gates into plans/r12/.

Usage:
    python3 tools/explain_gates.py <tag> gate1,gate2,...   # tag = before|after

Writes plans/r12/<gate>_<tag>.txt for each gate. Plans are captured at
$SPARK_GRAFT_SF_DIR (default sf0.1) on the bench session configuration
(tune_shuffle_partitions applied, matching what bench.py executes), so
Exchange counts / join strategies in the files are the bench's plans.

NOTE: gates that execute work at plan-build time (streaming replays,
write-path gates) pay that cost here; their captured plan is the final
batch read-back, which is still the part a plan diff can show.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r12")


def main() -> None:
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    os.makedirs(OUT, exist_ok=True)

    import __spark_entry__ as entry_mod
    from bqetl_spark.caching import release_pinned
    from bqetl_spark.session import get_spark, tune_shuffle_partitions

    spark = get_spark("bqetl_spark_explain")
    tune_shuffle_partitions(spark, SF_DIR)
    qs = entry_mod.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"explain:{name}")
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        release_pinned()
        print(f"captured {name} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
