#!/usr/bin/env python3
"""Per-extra Spark-vs-DuckDB timing at sf0.1 → BENCH_EXTRAS_r{N}.json.

Each bench.EXTRAS gate is timed in Spark (best-of-2 after an sf0.01 shape
warm-up) and its own oracle SQL is timed in DuckDB (60 s cap). Write-path /
streaming / rows-only gates get no duck timing (the oracle replays final
state, not the pipeline).

Usage: python3 tools/bench_extras.py [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

def _current_round() -> int:
    """Newest CORRECTNESS_r*.json + 1 — the same derivation sweep.py
    uses (r11 verdict flagged hard-coded round labels as provenance
    artifacts)."""
    import glob
    import re
    rounds = [int(m.group(1))
              for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
              if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))]
    return (max(rounds) + 1) if rounds else 1


OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    ROOT, f"BENCH_EXTRAS_r{_current_round():02d}.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.01"
DUCK_CAP_S = 60
# no duck timing: write-path/stream gates (oracle checks final state, not
# the pipeline) — timing the SQL would compare apples to pipelines
NO_DUCK = {"stream_kmv", "stream_hll", "stream_cms",
           "stream_quantile", "compression_ratio"}


def main() -> None:
    import duckdb

    import __spark_entry__ as em
    from bench import EXTRAS
    from bqetl_spark.caching import release_pinned
    from bqetl_spark.session import get_spark, tune_shuffle_partitions
    from tests.oracle_harness import TABLES

    spark = get_spark("bench_extras")
    tune_shuffle_partitions(spark, SF_DIR)
    qs, osql = em.queries(), em.oracle_sql()

    warm = WARM_DIR if os.path.isdir(WARM_DIR) else SF_DIR
    for name in EXTRAS:
        qs[name](spark, warm).count()
        release_pinned()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{SF_DIR}/{t}.parquet'")

    results: dict[str, dict] = {}
    for name in EXTRAS:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        release_pinned()
        entry: dict = {"spark_sec": round(best, 3)}
        if name in osql and name not in NO_DUCK:
            try:
                con.sql(f"SET statement_timeout='{DUCK_CAP_S}s'")
            except Exception:
                pass
            t0 = time.perf_counter()
            try:
                con.sql(osql[name]).fetchall()
                entry["duckdb_sec"] = round(time.perf_counter() - t0, 3)
            except Exception as exc:
                entry["duckdb_err"] = f"{type(exc).__name__}"[:80]
        results[name] = entry
        print("DONE", name, entry, file=sys.stderr, flush=True)

    out = {
        "sf": SF_DIR,
        "note": ("best-of-2 spark after sf0.01 shape warm-up; DuckDB = "
                 f"the same oracle SQL, {DUCK_CAP_S}s cap; write-path, "
                 "stream and rows-only gates have no duck timing"),
        "queries": results,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": OUT, "n": len(results)}))


if __name__ == "__main__":
    main()
