#!/usr/bin/env python3
"""Interleaved same-session Spark/DuckDB A/B for the headline ratio.

The r8→r9 bench artifacts showed the Spark/DuckDB headline ratio
creeping 0.61× → 0.65× with NO headline code changes — consistent with
box drift (the BENCH_AB_SHUFFLE_r06 precedent), but two rounds in a row
moved the same way, so the r9 verdict requires an interleaved A/B
before accepting drift as the explanation: alternate full Spark and
DuckDB headline passes inside ONE process several times, so both
engines sample the same minutes of machine weather.

Usage: cd /tmp && python3 /root/repo/tools/ab_drift.py [ROUNDS] [OUT]
Writes BENCH_AB_DRIFT_r10.json at the repo root: per-alternation totals
for both engines, the per-alternation ratio, and min/median spreads.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    ROOT, "BENCH_AB_DRIFT_r10.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _duck_timed(con, sql: str, cap_s: float = 60.0):
    """bench.duckdb_timings' interrupt discipline: the exact all-pairs
    near-dup oracles (minhash_lsh, ngram_jaccard) run for HOURS at
    sf0.1 — cap and record null, exactly like the per-round bench."""
    import threading

    import duckdb

    timer = threading.Timer(cap_s, con.interrupt)
    timer.start()
    try:
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        return round(time.perf_counter() - t0, 3)
    except duckdb.Error:
        return None
    finally:
        timer.cancel()


def main() -> None:
    import duckdb

    import __spark_entry__ as em
    from bench import HEADLINE
    from bqetl_spark.caching import release_pinned
    from bqetl_spark.session import get_spark, tune_shuffle_partitions
    from tests.oracle_harness import TABLES

    spark = get_spark("bqetl_spark_ab_drift")
    tune_shuffle_partitions(spark, SF_DIR)
    qs, osql = em.queries(), em.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    # warm both engines once (JIT / codegen / buffer pools out of the
    # timed region — bench.py's protocol)
    for name in HEADLINE:
        qs[name](spark, SF_DIR).count()
        release_pinned()
        if osql.get(name):
            _duck_timed(con, osql[name])
        print(f"WARM {name}", flush=True)

    alts = []
    for i in range(ROUNDS):
        s_per, d_per = {}, {}
        for name in HEADLINE:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            s_per[name] = round(time.perf_counter() - t0, 3)
            release_pinned()
        for name in HEADLINE:
            sql = osql.get(name)
            d_per[name] = _duck_timed(con, sql) if sql else None
        s_tot = round(sum(s_per.values()), 3)
        d_tot = round(sum(v for v in d_per.values() if v is not None), 3)
        # comparable ratio: only queries BOTH engines finished (the
        # headline ratio in BENCH_r* divides by the null-dropping duck
        # total, which flatters Spark — track both)
        s_comp = round(sum(s_per[n] for n in s_per
                           if d_per.get(n) is not None), 3)
        alts.append({"spark_total": s_tot, "duck_total": d_tot,
                     "spark_comparable": s_comp,
                     "ratio": round(s_tot / d_tot, 4),
                     "ratio_comparable": round(s_comp / d_tot, 4),
                     "spark": s_per, "duck": d_per})
        print(f"ALT {i}: spark {s_tot}s duck {d_tot}s "
              f"ratio {s_tot / d_tot:.3f} "
              f"comparable {s_comp / d_tot:.3f}", flush=True)

    ratios = [a["ratio"] for a in alts]
    artifact = {
        "sf": SF_DIR,
        "method": ("interleaved same-process alternations: full Spark "
                   "headline pass then full DuckDB oracle pass, repeated; "
                   "both engines sample identical machine weather, so "
                   "cross-round ratio creep that disappears here is drift"),
        "rounds": ROUNDS,
        "alternations": alts,
        "ratio_min": min(ratios), "ratio_max": max(ratios),
        "ratio_median": round(statistics.median(ratios), 4),
        "spark_total_median": round(statistics.median(
            a["spark_total"] for a in alts), 3),
        "duck_total_median": round(statistics.median(
            a["duck_total"] for a in alts), 3),
    }
    with open(OUT, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"SUMMARY ratio median {artifact['ratio_median']} "
          f"[{artifact['ratio_min']}, {artifact['ratio_max']}] -> {OUT}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
