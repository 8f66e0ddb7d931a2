#!/usr/bin/env python3
"""Interleaved same-session A/B of two git TREES on the headline set.

The r12 driver bench read 12/14 headline queries 1.5-2x slower than r11
with no relevant code change (the same binary was FASTER at 8 cores than
32, and DuckDB got faster in the same run) — the contention signature.
The r12 verdict requires attribution by a drift-proof protocol instead
of a shrug: alternate full headline passes of BOTH trees (and a DuckDB
pass) inside one wall-clock session, A,B,A,B..., so both trees sample
the same minutes of machine weather (the BENCH_AB_SHUFFLE_r06 /
BENCH_AB_DRIFT_r10 protocol, lifted from per-engine to per-tree).

Each pass is a fresh subprocess (cwd=/tmp, the tree's own bench
protocol: get_spark + tune_shuffle_partitions, warm at sf0.001, then
best-of-3 count() per query at $SPARK_GRAFT_SF_DIR).

Usage:
    python3 tools/ab_trees.py TREE_A TREE_B [ALTERNATIONS] [OUT.json]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

RUNNER = r"""
import json, os, sys, time
tree = sys.argv[1]
sf = sys.argv[2]
sys.path.insert(0, tree)
from bench import HEADLINE
gates_env = os.environ.get("BQETL_AB_GATES", "")
if gates_env:
    HEADLINE = [g for g in gates_env.split(",") if g]
from bqetl_spark.session import get_spark, tune_shuffle_partitions
from bqetl_spark.caching import release_pinned
import __spark_entry__ as em

spark = get_spark("ab_trees")
spark.sparkContext.setLogLevel("ERROR")
tune_shuffle_partitions(spark, sf)
qs = em.queries()
warm = "/root/testdata/sf0.001"
for name in HEADLINE:
    qs[name](spark, warm).count()
timings = {}
for name in HEADLINE:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        qs[name](spark, sf).count()
        best = min(best, time.perf_counter() - t0)
    release_pinned()
    timings[name] = round(best, 3)
print("ABJSON " + json.dumps(timings))
spark.stop()
"""


def run_tree(tree: str) -> dict:
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, tree, SF_DIR],
        cwd="/tmp", capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("ABJSON "):
            d = json.loads(line[len("ABJSON "):])
            d["__wall"] = round(time.perf_counter() - t0, 1)
            return d
    raise RuntimeError(f"no ABJSON from {tree}: {out.stdout[-500:]}\n"
                       f"{out.stderr[-1000:]}")


def duck_pass() -> float:
    import duckdb

    sys.path.insert(0, ROOT)
    import __spark_entry__ as em
    from tests.oracle_harness import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    osql = em.oracle_sql()
    from bench import DUCK_CAP_SEC, HEADLINE
    import threading
    total = 0.0
    for name in HEADLINE:
        sql = osql.get(name)
        if sql is None:
            continue
        timer = threading.Timer(DUCK_CAP_SEC, con.interrupt)
        timer.start()
        try:
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            total += time.perf_counter() - t0
        except duckdb.Error:
            pass
        finally:
            timer.cancel()
    return round(total, 3)


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    alts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        ROOT, "BENCH_AB_TREES_r13.json")

    runs = {"A": [], "B": []}
    ducks = []
    # gate-mode (BQETL_AB_GATES): tree-vs-tree attribution only — the
    # DuckDB normalization pass times headline oracles, skip it
    do_duck = not os.environ.get("BQETL_AB_GATES")
    for i in range(alts):
        for label, tree in (("A", tree_a), ("B", tree_b)):
            r = run_tree(tree)
            runs[label].append(r)
            print(f"alt {i} tree {label}: total "
                  f"{round(sum(v for k, v in r.items() if k != '__wall'), 3)}"
                  f" (wall {r['__wall']}s)", flush=True)
        if do_duck:
            ducks.append(duck_pass())
            print(f"alt {i} duckdb: {ducks[-1]}", flush=True)

    def totals(rs):
        return [round(sum(v for k, v in r.items() if k != "__wall"), 3)
                for r in rs]

    per_query = {}
    for name in runs["A"][0]:
        if name == "__wall":
            continue
        a = min(r[name] for r in runs["A"])
        b = min(r[name] for r in runs["B"])
        per_query[name] = {"A_best": a, "B_best": b,
                           "B_over_A": round(b / a, 3) if a else None}
    result = {
        "protocol": "alternating full headline subprocess passes, "
                    "best-of-3 count() per query inside each pass; one "
                    "DuckDB headline pass per alternation",
        "tree_A": tree_a, "tree_B": tree_b, "sf": SF_DIR,
        "alternations": alts,
        "totals_A": totals(runs["A"]),
        "totals_B": totals(runs["B"]),
        "duckdb_totals": ducks,
        "median_total_A": statistics.median(totals(runs["A"])),
        "median_total_B": statistics.median(totals(runs["B"])),
        "per_query": per_query,
        "runs_A": runs["A"], "runs_B": runs["B"],
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
