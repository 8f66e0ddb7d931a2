#!/usr/bin/env python3
"""Full-gate sweep under exact driver conditions: vanilla local[8]
SparkSession, cwd outside the repo, tests/oracle_harness.compare vs DuckDB
at sf0.01. Complements the driver's 50-gate-per-round window by
hash-checking EVERY oracle each round.

Usage: cd /tmp && python3 /root/repo/tools/sweep.py [OUT_JSON]
       cd /tmp && python3 /root/repo/tools/sweep.py --only g1,g2
Writes the artifact (default SWEEP_r08.json at the repo root) and prints a
one-line summary. Rows-only gates (no oracle) are counted separately.
--only runs just the named gates and does NOT write the artifact (quick
iteration check after touching a gate or oracle).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ONLY = None
args = sys.argv[1:]
if args and args[0] == "--only":
    ONLY = set(args[1].split(","))
    args = args[2:]
OUT = args[0] if args else os.path.join(ROOT, "SWEEP_r08.json")
SF = "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    from tests.oracle_harness import compare, duck_connection

    con = duck_connection(SF)
    qs, osql = em.queries(), em.oracle_sql()
    results: dict[str, dict] = {}
    n_match = 0
    for name in sorted(qs):
        if ONLY is not None and name not in ONLY:
            continue
        try:
            if name in osql:
                r = compare(qs[name](spark, SF), con, osql[name])
                results[name] = r
                n_match += bool(r["hash_match"])
                print(f"VERDICT {name} "
                      f"{'MATCH' if r['hash_match'] else r}", flush=True)
            else:
                n = qs[name](spark, SF).count()
                results[name] = {"rows_only": True, "rows": n}
                print(f"ROWS {name} {n}", flush=True)
        except Exception as exc:  # record, keep sweeping
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:500]}
            print(f"ERR {name} {type(exc).__name__}", flush=True)
    artifact = {
        "sf": SF,
        "session": "round-8",
        "method": ("vanilla local[8] SparkSession from cwd=/tmp (driver "
                   "conditions), tests/oracle_harness.compare (rows + "
                   "sorted columns + order-insensitive value hash) vs "
                   "DuckDB over the same parquet"),
        "n_gates": len(osql),
        "n_hash_match": n_match,
        "n_rows_only": len(qs) - len(osql),
        "results": results,
    }
    if ONLY is None:
        with open(OUT, "w") as fh:
            json.dump(artifact, fh, indent=1)
    n_ran_oracle = sum(1 for n in results if n in osql)
    n_ran_rows = sum(1 for n in results if n in qs and n not in osql)
    skipped = len(qs) - len(results)
    tail = f" ({skipped} skipped, artifact NOT written)" if ONLY is not None \
        else f" -> {OUT}"
    print(f"SUMMARY {n_match}/{n_ran_oracle} hash-match, "
          f"{n_ran_rows} rows-only{tail}", flush=True)


if __name__ == "__main__":
    main()
