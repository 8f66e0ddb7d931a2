#!/usr/bin/env python3
"""Hot-key skew join benchmark: naive sort-merge vs AQE skew splitting vs
explicit salting (operators/skew.salted_join).

Synthesizes a fact table where one key owns HOT_FRAC of all rows — the
classic boilerplate-document / null-surrogate-key hot spot — joined to a
dim too large to broadcast. Prints ONE JSON line:

  {"metric": "skew_join_sec", "value": <salted>, "unit": "sec",
   "queries": {"naive": s, "aqe_skew": s, "salted": s},
   "rows": N, "hot_frac": f}

Deterministic input (id-derived keys, no RNG). Broadcast is disabled so
the join actually shuffles — the regime where skew exists at all.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# 24M rows is the smallest size where the hot task dominates wall-clock on
# local[32]; at 4M the single-task sort is ~1s and every variant measures noise.
N_FACT = int(os.environ.get("SKEW_FACT_ROWS", 24_000_000))
N_DIM = int(os.environ.get("SKEW_DIM_ROWS", 200_000))
HOT_FRAC = 0.6
# salt=16 beats 32/64 here: wider salts collide in the 32 shuffle partitions
# and explode the dim side further without shrinking the max task.
SALT = int(os.environ.get("SKEW_SALT", 16))


def main() -> None:
    from pyspark.sql import functions as F

    from bqetl_spark.operators.skew import salted_join
    from bqetl_spark.session import get_spark

    spark = get_spark("bqetl_spark_bench_skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    # HOT_FRAC of fact rows land on key 0; the rest spread uniformly.
    fact = (spark.range(N_FACT).select(
        F.when(F.pmod(F.xxhash64("id"), F.lit(1000)) < int(HOT_FRAC * 1000),
               F.lit(0))
         .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_DIM)))
         .alias("fk"),
        F.col("id").alias("payload"))
        .persist())
    dim = (spark.range(N_DIM).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("name_"), F.col("id")).alias("dname"))
        .persist())
    fact.count(), dim.count()  # materialize outside the timed region

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def naive():
        fact.join(dim, fact["fk"] == dim["dk"]).agg(
            F.count("*"), F.max("dname")).collect()

    def salted():
        salted_join(fact, dim, "fk", "dk", salt=SALT).agg(
            F.count("*"), F.max("dname")).collect()

    def salted_auto():
        # frequency-adaptive: Misra-Gries hot-key detection, selective
        # scatter, shuffle-hash join (includes detection cost in the time)
        salted_join(fact, dim, "fk", "dk", salt=None).agg(
            F.count("*"), F.max("dname")).collect()

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_naive = timed(naive)
    t_salted = timed(salted)
    t_auto = timed(salted_auto)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_aqe = timed(naive)

    print(json.dumps({
        "metric": "skew_join_sec",
        "value": t_auto,
        "unit": "sec",
        "queries": {"naive": t_naive, "aqe_skew": t_aqe, "salted": t_salted,
                    "salted_auto": t_auto},
        "rows": N_FACT,
        "hot_frac": HOT_FRAC,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
