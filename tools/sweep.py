#!/usr/bin/env python3
"""Full-gate sweep under exact driver conditions: vanilla local[8]
SparkSession, cwd outside the repo, tests/oracle_harness.compare vs DuckDB
at sf0.01. Complements the driver's 50-gate-per-round window by
hash-checking EVERY oracle each round.

Usage: cd /tmp && python3 /root/repo/tools/sweep.py [OUT_JSON]
       cd /tmp && python3 /root/repo/tools/sweep.py --only g1,g2
       cd /tmp && python3 /root/repo/tools/sweep.py --stability [N]
Writes the artifact (default SWEEP_r{N}.json at the repo root, N derived
from the newest CORRECTNESS_r*.json + 1) and prints a
one-line summary. Rows-only gates (no oracle) are counted separately.
--only runs just the named gates and does NOT write the artifact (quick
iteration check after touching a gate or oracle).

Stability tier (r10, after the r9 unigram_segments incident): DuckDB's
vectorized evaluation of list_reduce lambdas that correlate multiple
outer columns has been observed returning DIFFERENT results across fresh
connections at full cardinality — invisible to any single-run compare.
Every list_reduce-bearing oracle is therefore executed N (default 3)
times, each in a FRESH connection, and all value hashes must agree.
The full sweep runs this tier automatically and records it in the
artifact; `--stability` runs the tier alone (no Spark needed; combine
with --only to target specific gates), exiting non-zero on any
instability.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ONLY = None
STABILITY_ONLY = False
STAB_RUNS = 3
args = sys.argv[1:]
while args and args[0].startswith("--"):
    if args[0] == "--only":
        ONLY = set(args[1].split(","))
        args = args[2:]
    elif args[0] == "--stability":
        STABILITY_ONLY = True
        args = args[1:]
        if args and args[0].isdigit():
            STAB_RUNS = int(args[0])
            args = args[1:]
    else:
        raise SystemExit(f"unknown flag {args[0]}")
def _current_round() -> int:
    """Round = newest CORRECTNESS_r*.json + 1 (this sweep previews the
    NEXT driver evaluation; VERDICT r11 flagged the old hard-coded
    'round-10' label as a provenance artifact)."""
    import glob
    import re
    rounds = [int(m.group(1))
              for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
              if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))]
    return (max(rounds) + 1) if rounds else 1


ROUND = _current_round()
OUT = args[0] if args else os.path.join(ROOT, f"SWEEP_r{ROUND:02d}.json")
# r12: overridable so restructured operators can be oracle-proven at
# sf0.1 too (the bench SF), not just the sweep's sf0.01
SF = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")


def stability_tier(osql: dict[str, str], runs: int = STAB_RUNS,
                   only: set[str] | None = None) -> dict[str, dict]:
    """Run every lambda-bearing oracle `runs`× in fresh DuckDB
    connections; a gate is stable iff all value hashes agree.

    Predicate broadened r11: the r9 incident class was list_reduce, but
    list comprehensions and list_transform lambdas ride the same
    vectorized-closure machinery, so every oracle using any of them is
    in the tier (49 oracles vs the original 14 — DuckDB-only runs, a
    few extra minutes per sweep)."""
    from tests.oracle_harness import duck_connection, value_hash

    lam = ("list_reduce", "list_transform", "for i in range", "for x in")
    targets = [n for n, s in sorted(osql.items())
               if any(t in s for t in lam)
               and (only is None or n in only)]
    out: dict[str, dict] = {}
    for name in targets:
        hashes = []
        try:
            for _ in range(runs):
                con = duck_connection(SF)        # FRESH connection per run
                rel = con.sql(osql[name])
                hashes.append(value_hash(rel.columns, rel.fetchall()))
                con.close()
            stable = len(set(hashes)) == 1
        except Exception as exc:
            out[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"STAB {name} ERR {type(exc).__name__}", flush=True)
            continue
        out[name] = {"stable": stable, "runs": runs,
                     "n_distinct_hashes": len(set(hashes))}
        print(f"STAB {name} {'STABLE' if stable else 'UNSTABLE'}",
              flush=True)
    return out


def main() -> None:
    if STABILITY_ONLY:
        import __spark_entry__ as em

        res = stability_tier(em.oracle_sql(), STAB_RUNS, ONLY)
        bad = [n for n, r in res.items() if not r.get("stable", False)]
        print(f"SUMMARY stability {len(res) - len(bad)}/{len(res)} stable",
              flush=True)
        sys.exit(1 if bad else 0)

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    from bqetl_spark.caching import release_pinned
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
        finally:
            # 220+ gates in ONE vanilla JVM: operator pins accumulate
            # and blew the driver heap at gate ~200 (r10 second half —
            # two spurious OOM rows in an otherwise green sweep).
            # Per-gate release matches the driver, which never runs two
            # gates against shared cache state either.
            release_pinned()
            spark.catalog.clearCache()
    stability = stability_tier(osql) if ONLY is None else {}
    artifact = {
        "sf": SF,
        "session": f"round-{ROUND}",
        "method": ("vanilla local[8] SparkSession from cwd=/tmp (driver "
                   "conditions), tests/oracle_harness.compare (rows + "
                   "sorted columns + order-insensitive value hash) vs "
                   "DuckDB over the same parquet"),
        "n_gates": len(osql),
        "n_hash_match": n_match,
        "n_rows_only": len(qs) - len(osql),
        "results": results,
        "stability": stability,
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
