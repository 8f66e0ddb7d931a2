"""Skew-aware join helpers.

AQE's skew-join splitting (enabled in session.py) is the DEFAULT answer to
join skew in this engine — it splits oversized shuffle partitions at
runtime with no plan changes and BENCH_SKEW shows it beating a blanket
16-way salt (11.4 s vs 20.1 s on a 60%-hot key over 24M rows). Reach for
explicit salting only where AQE cannot help:

- skewed AGGREGATIONS (AQE skew handling applies to joins only);
- a hot key so large that even one split sub-partition overflows a task
  (AQE splits the left partition but replicates the right partition
  whole);
- non-AQE runtimes / stages where the shuffle feeding the join is reused.

``salted_join`` therefore now defaults to FREQUENCY-ADAPTIVE salting:
with ``salt=None`` it detects hot keys with a per-partition Misra-Gries
pass (metadata-sized candidate set, exact recount — same shape as
functions/sketch.heavy_hitter_tokens) and scatters ONLY those keys, each
across a factor proportional to its observed share. Non-hot keys keep
salt 0, so the right side is replicated only for the handful of hot keys
instead of ×salt everywhere — the blanket-salt dim blowup was the main
reason the fixed salt lost to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LEFT_HOWS = {"inner", "left", "left_outer", "leftouter", "semi",
              "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}


def hot_key_shares(df: DataFrame, key: str, k: int = 64,
                   sample_rows: int = 2_000_000,
                   seed: int = 8675309) -> list[tuple]:
    """Approximate (key, share) for keys whose sampled share exceeds 1/k —
    the detection half of adaptive salting, ALL-JVM.

    A seeded Bernoulli sample bounds the scanned fraction (~sample_rows
    rows regardless of fact size), and the groupBy's partial aggregation
    bounds the shuffle to distinct-keys-in-sample. This replaces an exact
    Misra-Gries pass (see :func:`hot_keys`) in the salting path because
    the salt factor is a PERFORMANCE HINT, never a correctness input —
    salted_join's result is distribution-invariant by construction, so an
    estimate is enough and the detection must not cost an Arrow export of
    the whole fact table (measured: 16.6 s auto-salt with the Python MG
    pass vs 6-7 s with this sampler on a 24M-row fact)."""
    n = df.count()
    frac = 1.0 if n <= sample_rows else sample_rows / n
    s = df if frac >= 1.0 else df.sample(fraction=frac, seed=seed)
    sample_n = max(1.0, n * frac)       # expectation; enough for a hint
    rows = (s.groupBy(F.col(key).cast("string").alias("__k"))
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") * k > F.lit(sample_n))
            .collect())
    return [(r["__k"], r["__c"] / sample_n) for r in rows
            if r["__k"] is not None]


def hot_keys(df: DataFrame, key: str, k: int = 64) -> list[tuple]:
    """EXACT (key, count, total) for every key with frequency > total/k,
    via per-partition Misra-Gries candidates + exact recount.

    Scale shape: the sketch holds ≤ k counters per partition, so at most
    k·partitions candidate rows cross the wire regardless of distinct-key
    cardinality; the recount semi-joins the stream to the candidates. The
    result is metadata-sized (≤ k rows) by the pigeonhole coverage
    argument in functions/sketch.heavy_hitter_tokens.
    """
    total = df.count()
    keys = df.select(F.col(key).cast("string").alias("__k"))

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for t, c in pdf["__k"].value_counts(dropna=False).items():
                t = "\x00null" if pd.isna(t) else str(t)
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - cut for t, c in counters.items()
                            if c - cut > 0}
        yield pd.DataFrame({"__k": [t for t in counters if t != "\x00null"]})

    cands = keys.mapInPandas(mg, "__k string").distinct()
    counts = (keys.join(F.broadcast(cands), "__k")
              .groupBy("__k").agg(F.count("*").alias("__n"))
              .filter(F.col("__n") * k > F.lit(total)))
    return [(r["__k"], int(r["__n"]), total) for r in counts.collect()]


def salted_join(left: DataFrame, right: DataFrame, left_key: str,
                right_key: str, salt: int | None = None,
                how: str = "inner", sketch_k: int = 64) -> DataFrame:
    """Equi join with key scattering for hot-key skew.

    ``salt=None`` (default): frequency-adaptive. Hot keys (share > 1/k of
    the left side, found by :func:`hot_key_shares`) are scattered across
    ``ceil(share × shuffle_partitions)`` sub-keys each; all other keys
    keep salt 0, so the right side is replicated only for the hot keys
    (a handful of extra rows, not ×salt everywhere). With no hot keys the
    join degrades to a plain equi join with zero replication.

    ``salt=N``: the blanket N-way scatter (every left row salted by a
    deterministic row hash, right side exploded ×N) — kept for callers
    that know the distribution and for distribution-invariance testing.

    Result equals a plain equi join; only the physical distribution
    changes. Left-preserving joins only (inner/left/semi/anti): a
    right/full outer join over an exploded right side would emit one
    null-padded row PER REPLICA for unmatched right rows.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "")
                                            for h in _LEFT_HOWS}:
        raise ValueError(
            f"salted_join supports left-preserving joins only, got {how!r}: "
            "replicated unmatched right rows would each surface in a "
            "right/full outer result. Use AQE skew-join for those.")

    if salt is not None:
        lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                       F.lit(salt))
        l = left.withColumn("__salt_l", lsalt)
        r = (right.withColumn(
            "__salt_r", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))))
        out = l.join(r, (l[left_key] == r[right_key]) &
                     (l["__salt_l"] == r["__salt_r"]), how)
        return out.drop("__salt_l", "__salt_r")

    spark = left.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    hot = hot_key_shares(left, left_key, k=sketch_k)
    if not hot:
        return left.join(right, left[left_key] == right[right_key], how)

    # per-key scatter factor ~ the number of average-sized partitions this
    # key's rows would fill (≥2 so a detected hot key always splits)
    factors = [(kv, max(2, min(4 * n_part, round(share * n_part))))
               for kv, share in hot]
    f_map = spark.createDataFrame(
        [(kv, f) for kv, f in factors], ["__hk", "__f"])

    row_hash = F.xxhash64(*[left[c] for c in left.columns])
    l = (left.join(F.broadcast(f_map),
                   left[left_key].cast("string") == F.col("__hk"), "left")
         .withColumn("__salt_l",
                     # NULL keys never equi-match, but a left join still
                     # shuffles them — spread them over all partitions
                     # (the null-hot-key skew AQE also can't split)
                     F.when(left[left_key].isNull(),
                            F.pmod(row_hash, F.lit(n_part)))
                      .when(F.col("__f").isNotNull(),
                            F.pmod(row_hash, F.col("__f")))
                      .otherwise(F.lit(0)))
         .drop("__hk", "__f"))
    r = (right.join(F.broadcast(f_map),
                    right[right_key].cast("string") == F.col("__hk"), "left")
         .withColumn("__salt_r",
                     F.explode(F.sequence(
                         F.lit(0), F.coalesce(F.col("__f"), F.lit(1)) - 1)))
         .drop("__hk", "__f"))
    # the scattered join is uniform by construction; a shuffle-hash join
    # skips the 2×sort that dominates sort-merge on a large fact side
    out = l.join(r.hint("shuffle_hash"),
                 (l[left_key] == r[right_key]) &
                 (l["__salt_l"] == r["__salt_r"]), how)
    return out.drop("__salt_l", "__salt_r")
