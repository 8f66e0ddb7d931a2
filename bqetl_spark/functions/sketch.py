"""Sketch-accelerated exact operators.

The production pattern: a per-partition sketch proposes a small candidate
set with a coverage guarantee, then one exact pass over candidates only
produces the EXACT answer — so the result is deterministic and fully
oracle-checkable even though a sketch did the heavy lifting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bqetl_spark.functions.text import tokens


def heavy_hitter_tokens(df: DataFrame, text_col: str = "text",
                        k: int = 50) -> DataFrame:
    """Exact tokens with frequency strictly greater than total_tokens/k,
    via per-partition Misra-Gries candidates + exact recount.

    Why not a plain groupBy: at 100 TB the token groupBy shuffles one
    record per DISTINCT token (billions); Misra-Gries holds at most k
    counters per partition, so the candidate set that crosses the wire is
    ≤ k·partitions rows, and the exact recount semi-joins the stream down
    to those candidates before aggregating.

    Coverage proof (why the result is exact, not approximate): a token
    with global freq > n/k has freq_p > n_p/k in at least one partition
    (pigeonhole over Σn_p = n), and Misra-Gries with capacity k retains
    any token with partition frequency > n_p/(k+1) — so every true heavy
    hitter is a candidate; the recount then computes exact counts and the
    threshold filter discards false candidates. Python touches only
    per-batch VALUE COUNTS (pandas value_counts is vectorized); the
    decrement step runs once per Arrow batch, not per row.

    Returns (tok, n_occurrences) — exact, deterministic, SQL-oracle-able.
    """
    toks = (df.filter(F.trim(F.col(text_col)) != "")
            .select(F.explode(tokens(F.col(text_col))).alias("tok")))
    total = toks.count()

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for t, c in pdf["tok"].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > k:
                # subtract the (k+1)-th largest from everyone; drop <= 0.
                # decrement mass per surviving token <= n_p/(k+1) total,
                # preserving the Misra-Gries retention guarantee.
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - cut for t, c in counters.items()
                            if c - cut > 0}
        yield pd.DataFrame({"tok": list(counters.keys())})

    cands = toks.mapInPandas(mg, "tok string").distinct()
    return (toks.join(F.broadcast(cands), "tok")
            .groupBy("tok")
            .agg(F.count("*").alias("n_occurrences"))
            .filter(F.col("n_occurrences") * k > F.lit(total)))
