#!/usr/bin/env python3
"""sf1 scale point: run the headline queries at a 10× replication of sf0.1.

Usage: ``python tools/bench_sf1.py [SF1_DIR]`` (default /tmp/sf1; generated
with tools/gen_scale.py if absent). Writes BENCH_SF1.json at the repo root
and prints it.

Two deliberate deviations from bench.py, both documented in the JSON:

- single timed run per query after an sf0.01 shape warm-up (runtimes at
  sf1 are large enough that launch noise is second-order);
- the two gram-inverted-index ops run WITH their boilerplate-skew guards
  (ngram max_gram_freq / winnow max_hash_freq = 50). Replicating a corpus
  10× multiplies every shared gram's doc-frequency by 10 and
  inflates candidate pairs quadratically (~100×) — precisely the
  boilerplate-gram blowup the guards exist for at 100 TB. The unguarded
  exact variants remain what bench.py measures at sf0.1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF1_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
WARM_DIR = "/root/testdata/sf0.01"
GUARD = 50


def main() -> None:
    if not os.path.isdir(SF1_DIR):
        subprocess.run([sys.executable, f"{ROOT}/tools/gen_scale.py",
                        "/root/testdata/sf0.1", SF1_DIR, "10"], check=True)

    import __spark_entry__ as em
    from bench import HEADLINE
    from bqetl_spark.caching import release_pinned
    from bqetl_spark.functions import dedup as dd
    from bqetl_spark.session import get_spark
    from bqetl_spark.sources.parquet_source import load_parquet_table

    spark = get_spark("bqetl_spark_bench_sf1")
    qs = dict(em.queries())
    # guarded gram-index variants (see module docstring)
    qs["ngram_jaccard"] = lambda s, d: dd.ngram_jaccard_pairs(
        load_parquet_table(s, d, "documents"), n=3, threshold=0.5,
        max_gram_freq=GUARD)
    qs["winnow_neardup"] = lambda s, d: dd.winnow_overlap_pairs(
        load_parquet_table(s, d, "documents"), k=8, w=4, threshold=0.5,
        max_hash_freq=GUARD)

    # EXPLICIT extras list (not bench.EXTRAS): the unguarded replication
    # hotspots are excluded at sf1 — dedup_keep_best re-runs the full LSH
    # cluster pipeline, and simhash/semantic_dedup block/cell candidate
    # sets scale quadratically with the generator's cross-copy sibling
    # density (the documented 10×-replication artifact, not a real-corpus
    # shape; their guards live in the operators, exercised at sf0.1).
    extras = ["doc_chunks", "sample_hash", "stratified_sample",
              "pack_sequences", "snapshot_reconcile", "interval_overlap",
              "salted_join_auto", "session_window", "zorder_key",
              "multimodal_decode",
              # round-5 set (restored — the r5 artifact carried these but
              # the script edit was not committed)
              "kmv_distinct", "tfidf_topk", "source_divergence",
              "embed_centroids", "weighted_sample", "bigram_pmi",
              "key_skew", "pagerank", "sampled_quantiles", "sql_frontdoor",
              "events_gapfill", "export_shards",
              # round 6
              "multimodal_png", "temperature_sample", "stream_kmv",
              "hard_negatives", "compression_ratio", "increasing_runs"]

    for name in HEADLINE + extras:
        qs[name](spark, WARM_DIR).count()
    release_pinned()

    timings: dict[str, float] = {}
    for name in HEADLINE + extras:
        t0 = time.perf_counter()
        qs[name](spark, SF1_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        release_pinned()
        print("DONE", name, timings[name], file=sys.stderr, flush=True)

    out = {
        "metric": "total_headline_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF1_DIR,
        "note": ("10x replication of sf0.1 (tools/gen_scale.py); single "
                 "timed run, sf0.01 shape warm-up; ngram_jaccard and "
                 f"winnow_neardup use skew guards (freq<={GUARD}) because "
                 "replication multiplies shared-gram doc-frequency 10x and "
                 "candidate pairs ~100x — the boilerplate blowup the guards "
                 "exist for. minhash_lsh runs with the default signature-"
                 "estimated-Jaccard pre-filter (round 5): cross-copy "
                 "siblings sit just below the jaccard threshold yet band-"
                 "collide ~40% of the time, and the pre-filter drops those "
                 "~100k failing candidates before the exact shingle verify "
                 "(69.5s -> ~10-13s here)."),
    }
    with open(f"{ROOT}/BENCH_SF1.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
