#!/usr/bin/env python3
"""ANN recall/latency curves: LSH and IVF vs the exact brute-force top-k.

For each parameter point, measures wall-clock and recall@k against
cosine_topk ground truth over $SPARK_GRAFT_SF_DIR embeddings, with the
first N_QUERIES vectors as the probe batch (the serving shape: a query
batch against a big corpus; the corpus side never collects).
Prints ONE JSON line:

  {"metric": "ann_curves", "sf": ..., "k": K,
   "exact_sec": s, "points": [
     {"algo": "lsh", "params": {...}, "sec": s, "recall": r}, ...]}

The shape to read off: recall climbs with n_tables (LSH) / n_probe (IVF)
while latency grows sub-linearly — the knob a 100 TB deployment tunes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 5
N_QUERIES = int(os.environ.get("ANN_QUERIES", 100))


def main() -> None:
    from bqetl_spark.functions import similarity as sim
    from bqetl_spark.session import get_spark

    spark = get_spark("bqetl_spark_bench_ann")
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    emb.count()
    q = emb.filter(F.col("vec_id") < N_QUERIES).cache()
    q.count()

    def truth_set(rows):
        return {(r["query_id"], r["neighbor_id"]) for r in rows}

    t0 = time.perf_counter()
    exact = sim.cosine_topk(emb, q, k=K).collect()
    exact_sec = round(time.perf_counter() - t0, 3)
    truth = truth_set(exact)

    points = []

    def measure(algo, params, fn):
        t0 = time.perf_counter()
        rows = fn().collect()
        sec = round(time.perf_counter() - t0, 3)
        got = truth_set(rows)
        points.append({"algo": algo, "params": params, "sec": sec,
                       "recall": round(len(got & truth) / len(truth), 4)})

    for n_tables in (2, 8, 16):
        measure("lsh", {"n_tables": n_tables, "n_bits": 4},
                lambda n=n_tables: sim.lsh_bucket_topk(
                    emb, q, k=K, dim=64, n_tables=n, n_bits=4))
    for n_probe in (2, 4, 8):
        measure("ivf", {"n_lists": 16, "n_probe": n_probe},
                lambda p=n_probe: sim.ivf_topk(
                    emb, q, k=K, n_lists=16, n_probe=p))
    # Lloyd refinement: tighter lists -> better recall at the same probe
    # budget (the knob that matters once probes are fixed by latency)
    for n_probe in (4, 8):
        measure("ivf_kmeans", {"n_lists": 16, "n_probe": n_probe,
                               "iters": 2},
                lambda p=n_probe: sim.ivf_topk(
                    emb, q, k=K, n_lists=16, n_probe=p, refine_iters=2))
    # int8 scalar quantization: a different accuracy axis — full scan like
    # exact but 4-8x fewer bytes/vector; error from the grid, not pruning
    measure("sq8", {"bits": 8},
            lambda: sim.sq_cosine_topk(emb, q, k=K))

    # r7: hard-negative mining through the IVF path — recall measured
    # against the EXACT different-label miner (its own ground truth, not
    # the unconstrained top-k)
    hn_truth = truth_set(sim.hard_negatives(emb, q, k=K).collect())
    for n_probe in (4, 8, 12):
        t0 = time.perf_counter()
        rows = sim.hard_negatives_ann(emb, q, k=K, n_lists=16,
                                      n_probe=n_probe).collect()
        sec = round(time.perf_counter() - t0, 3)
        got = truth_set(rows)
        points.append({"algo": "hard_negatives_ann",
                       "params": {"n_lists": 16, "n_probe": n_probe},
                       "sec": sec,
                       "recall": round(len(got & hn_truth) / len(hn_truth),
                                       4)})

    print(json.dumps({"metric": "ann_curves", "sf": SF_DIR, "k": K,
                      "n_queries": N_QUERIES,
                      "exact_sec": exact_sec, "points": points}))
    spark.stop()


if __name__ == "__main__":
    main()
